/* Stage-by-stage dumper for the r941_native graph: runs the reference
 * pipeline (src/networks.c:539-586 call sequence, via the public layer
 * API) on a float32 signal file, dumping every intermediate matrix so
 * per-stage numeric parity can be measured against the JAX side
 * (tests/ref_harness/compare_stages.py).
 *
 * Build: see build_oracle.sh (add probe_stages.c as the driver).
 */
#define _GNU_SOURCE
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "flappie_common.h"
#include "layers.h"
#include "networks.h"
#include "nnfeatures.h"
#include "util.h"

/* weight lookup exported by the generated model header via networks.c
 * is static there; redeclare the _Mat statics we need. */
extern _Mat _conv1_rnnrf_flipflop5_r941native_W, _conv1_rnnrf_flipflop5_r941native_b;
extern _Mat _conv2_rnnrf_flipflop5_r941native_W, _conv2_rnnrf_flipflop5_r941native_b;
extern _Mat _conv3_rnnrf_flipflop5_r941native_W, _conv3_rnnrf_flipflop5_r941native_b;
extern _Mat _lstmB1_rnnrf_flipflop5_r941native_iW, _lstmB1_rnnrf_flipflop5_r941native_sW, _lstmB1_rnnrf_flipflop5_r941native_b;
extern _Mat _lstmF2_rnnrf_flipflop5_r941native_iW, _lstmF2_rnnrf_flipflop5_r941native_sW, _lstmF2_rnnrf_flipflop5_r941native_b;
extern _Mat _lstmB3_rnnrf_flipflop5_r941native_iW, _lstmB3_rnnrf_flipflop5_r941native_sW, _lstmB3_rnnrf_flipflop5_r941native_b;
extern _Mat _lstmF4_rnnrf_flipflop5_r941native_iW, _lstmF4_rnnrf_flipflop5_r941native_sW, _lstmF4_rnnrf_flipflop5_r941native_b;
extern _Mat _lstmB5_rnnrf_flipflop5_r941native_iW, _lstmB5_rnnrf_flipflop5_r941native_sW, _lstmB5_rnnrf_flipflop5_r941native_b;
extern _Mat _FF_rnnrf_flipflop5_r941native_W, _FF_rnnrf_flipflop5_r941native_b;

static void dump(const char *dir, const char *name, const flappie_matrix m) {
    char path[4096];
    snprintf(path, sizeof path, "%s/%s.bin", dir, name);
    FILE *fp = fopen(path, "wb");
    if (!fp) { perror(path); exit(2); }
    int32_t hdr[2] = { (int32_t)m->nr, (int32_t)m->nc };
    fwrite(hdr, sizeof(int32_t), 2, fp);
    for (size_t c = 0; c < m->nc; c++) {
        fwrite(m->data.f + c * m->stride, sizeof(float), m->nr, fp);
    }
    fclose(fp);
}

int main(int argc, char **argv) {
    if (argc != 3) {
        fprintf(stderr, "usage: probe_stages <signal.f32> <outdir>\n");
        return 2;
    }
    const char *outdir = argv[2];

    FILE *fp = fopen(argv[1], "rb");
    if (!fp) { perror(argv[1]); return 2; }
    fseek(fp, 0, SEEK_END);
    size_t nsample = (size_t)ftell(fp) / sizeof(float);
    fseek(fp, 0, SEEK_SET);
    float *raw = calloc(nsample, sizeof(float));
    if (fread(raw, sizeof(float), nsample, fp) != nsample) return 2;
    fclose(fp);

    const float raw_unit = 1373.41f / 8192.0f;
    for (size_t i = 0; i < nsample; i++) raw[i] = (raw[i] + 16.0f) * raw_unit;
    raw_table rt = { strdup("probe"), nsample, 0, nsample, raw };
    rt = trim_and_segment_raw(rt, 200, 10, 100, 0.0f);
    medmad_normalise_array(rt.raw + rt.start, rt.end - rt.start);

    flappie_matrix x = features_from_raw(rt);
    dump(outdir, "features", x);

    flappie_matrix c1 = convolution(x, &_conv1_rnnrf_flipflop5_r941native_W,
                                    &_conv1_rnnrf_flipflop5_r941native_b, 1, NULL);
    swish_activation_inplace(c1);
    dump(outdir, "conv1", c1);
    flappie_matrix c2 = convolution(c1, &_conv2_rnnrf_flipflop5_r941native_W,
                                    &_conv2_rnnrf_flipflop5_r941native_b, 1, NULL);
    swish_activation_inplace(c2);
    dump(outdir, "conv2", c2);
    flappie_matrix c3 = convolution(c2, &_conv3_rnnrf_flipflop5_r941native_W,
                                    &_conv3_rnnrf_flipflop5_r941native_b, 5, NULL);
    swish_activation_inplace(c3);
    dump(outdir, "conv3", c3);

    const _Mat *iW[5] = { &_lstmB1_rnnrf_flipflop5_r941native_iW, &_lstmF2_rnnrf_flipflop5_r941native_iW,
                          &_lstmB3_rnnrf_flipflop5_r941native_iW, &_lstmF4_rnnrf_flipflop5_r941native_iW,
                          &_lstmB5_rnnrf_flipflop5_r941native_iW };
    const _Mat *sW[5] = { &_lstmB1_rnnrf_flipflop5_r941native_sW, &_lstmF2_rnnrf_flipflop5_r941native_sW,
                          &_lstmB3_rnnrf_flipflop5_r941native_sW, &_lstmF4_rnnrf_flipflop5_r941native_sW,
                          &_lstmB5_rnnrf_flipflop5_r941native_sW };
    const _Mat *bias[5] = { &_lstmB1_rnnrf_flipflop5_r941native_b, &_lstmF2_rnnrf_flipflop5_r941native_b,
                            &_lstmB3_rnnrf_flipflop5_r941native_b, &_lstmF4_rnnrf_flipflop5_r941native_b,
                            &_lstmB5_rnnrf_flipflop5_r941native_b };

    flappie_matrix h = c3;
    for (int l = 0; l < 5; l++) {
        char nm[32];
        flappie_matrix xa = feedforward_linear(h, (const_flappie_matrix)iW[l],
                                               (const_flappie_matrix)bias[l], NULL);
        snprintf(nm, sizeof nm, "lstm%d_in", l + 1);
        dump(outdir, nm, xa);
        if (h != c3) free_flappie_matrix(h);
        h = (l % 2 == 0)
            ? lstm_backward(xa, (const_flappie_matrix)sW[l], NULL)
            : lstm_forward(xa, (const_flappie_matrix)sW[l], NULL);
        free_flappie_matrix(xa);
        snprintf(nm, sizeof nm, "lstm%d", l + 1);
        dump(outdir, nm, h);
    }

    flappie_matrix trans = globalnorm_flipflop(h, &_FF_rnnrf_flipflop5_r941native_W,
                                               &_FF_rnnrf_flipflop5_r941native_b, 1.0f, NULL);
    dump(outdir, "trans", trans);
    printf("probe: nsample=%zu trimmed=[%zu,%zu) nblk=%zu\n",
           nsample, rt.start, rt.end, trans->nc);
    return 0;
}
