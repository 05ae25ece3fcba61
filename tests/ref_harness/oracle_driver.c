/* Oracle driver: runs the *reference's own C pipeline* (compiled from
 * /root/reference/src with synthetic weight headers, see
 * build_oracle.sh) on a raw float32 signal file and prints the
 * basecall in the selected output format.
 *
 * This replaces the reference CLIs (src/flappie.c, src/runnie.c) only
 * in what they cannot do in this environment: fast5/HDF5 input (no
 * libhdf5 headers in the image) and argp.  Signal comes from a flat
 * little-endian float32 file of ADC counts; channel scaling
 * ((raw + offset) * range / digitisation, src/fast5_interface.c:297-303)
 * is applied here with the same float32 arithmetic.  Everything from
 * trimming onwards calls the reference functions directly, matching
 * the call sequences of flappie.c:245-316 and runnie.c:241-316.
 *
 * Output goldens produced by this driver are committed under
 * tests/goldens/ and compared byte-for-byte by
 * tests/test_reference_parity.py.
 */
#define _GNU_SOURCE
#include <math.h>
#include <stdbool.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "decode.h"
#include "flappie_common.h"
#include "flappie_output.h"
#include "flappie_structures.h"
#include "layers.h"
#include "networks.h"
#include "util.h"

static float *read_f32_file(const char *path, size_t *n_out) {
    FILE *fp = fopen(path, "rb");
    if (!fp) { perror(path); exit(2); }
    fseek(fp, 0, SEEK_END);
    long sz = ftell(fp);
    fseek(fp, 0, SEEK_SET);
    size_t n = (size_t)sz / sizeof(float);
    float *buf = calloc(n, sizeof(float));
    if (fread(buf, sizeof(float), n, fp) != n) { perror("fread"); exit(2); }
    fclose(fp);
    *n_out = n;
    return buf;
}

static void dump_fmat(const char *path, const flappie_matrix m) {
    FILE *fp = fopen(path, "wb");
    if (!fp) { perror(path); exit(2); }
    int32_t hdr[2] = { (int32_t)m->nr, (int32_t)m->nc };
    fwrite(hdr, sizeof(int32_t), 2, fp);
    for (size_t c = 0; c < m->nc; c++) {
        fwrite(m->data.f + c * m->stride, sizeof(float), m->nr, fp);
    }
    fclose(fp);
}

static void dump_imat(const char *path, const flappie_imatrix m) {
    FILE *fp = fopen(path, "wb");
    if (!fp) { perror(path); exit(2); }
    int32_t hdr[2] = { (int32_t)m->nr, (int32_t)m->nc };
    fwrite(hdr, sizeof(int32_t), 2, fp);
    for (size_t c = 0; c < m->nc; c++) {
        fwrite(m->data.f + c * m->stride, sizeof(int32_t), m->nr, fp);
    }
    fclose(fp);
}

int main(int argc, char **argv) {
    const char *modelstr = "r941_native";
    const char *signal_path = NULL;
    const char *uuid = "00000000-0000-0000-0000-000000000000";
    const char *readname = "signal";
    const char *formatstr = "fastq";
    const char *prefix = "";
    const char *dump_trans = NULL, *dump_trace = NULL;
    bool viterbi_only = false, reverse = false, uuid_primary = true;
    bool scale = true;
    float temperature = 1.0f, delta = 0.0f;
    float offset = 16.0f, range = 1373.41f, digitisation = 8192.0f;
    size_t trim_start = 200, trim_end = 10, varseg_chunk = 100;
    float varseg_thresh = 0.0f;

    for (int i = 1; i < argc; i++) {
#define OPT(name) (0 == strcmp(argv[i], name))
#define ARG (argv[++i])
        if (OPT("--model")) modelstr = ARG;
        else if (OPT("--signal")) signal_path = ARG;
        else if (OPT("--uuid")) uuid = ARG;
        else if (OPT("--readname")) readname = ARG;
        else if (OPT("--format")) formatstr = ARG;
        else if (OPT("--prefix")) prefix = ARG;
        else if (OPT("--viterbi")) viterbi_only = true;
        else if (OPT("--reverse")) reverse = true;
        else if (OPT("--no-uuid")) uuid_primary = false;
        else if (OPT("--no-scale")) scale = false;
        else if (OPT("--temperature")) temperature = strtof(ARG, NULL);
        else if (OPT("--delta")) delta = strtof(ARG, NULL);
        else if (OPT("--offset")) offset = strtof(ARG, NULL);
        else if (OPT("--range")) range = strtof(ARG, NULL);
        else if (OPT("--digitisation")) digitisation = strtof(ARG, NULL);
        else if (OPT("--trim-start")) trim_start = strtoul(ARG, NULL, 10);
        else if (OPT("--trim-end")) trim_end = strtoul(ARG, NULL, 10);
        else if (OPT("--varseg-chunk")) varseg_chunk = strtoul(ARG, NULL, 10);
        else if (OPT("--varseg-thresh")) varseg_thresh = strtof(ARG, NULL);
        else if (OPT("--dump-trans")) dump_trans = ARG;
        else if (OPT("--dump-trace")) dump_trace = ARG;
        else { fprintf(stderr, "unknown option %s\n", argv[i]); return 2; }
#undef OPT
#undef ARG
    }
    if (!signal_path) { fprintf(stderr, "--signal required\n"); return 2; }

    enum model_type model = get_flappie_model_type(modelstr);
    if (model == FLAPPIE_MODEL_INVALID) {
        fprintf(stderr, "invalid model %s\n", modelstr);
        return 2;
    }

    size_t nsample = 0;
    float *raw = read_f32_file(signal_path, &nsample);
    if (scale) {
        /* fast5_interface.c:297-303 */
        const float raw_unit = range / digitisation;
        for (size_t i = 0; i < nsample; i++) {
            raw[i] = (raw[i] + offset) * raw_unit;
        }
    }
    raw_table rt = { strdup(uuid), nsample, 0, nsample, raw };

    rt = trim_and_segment_raw(rt, trim_start, trim_end, varseg_chunk, varseg_thresh);
    if (rt.raw == NULL) { fprintf(stderr, "trim failed\n"); return 1; }
    if (delta == 0.0f) {
        medmad_normalise_array(rt.raw + rt.start, rt.end - rt.start);
    } else {
        difference_array(rt.raw + rt.start, rt.end - rt.start);
        shift_scale_array(rt.raw + rt.start, rt.end - rt.start, 0.0, delta);
    }

    flappie_matrix trans_weights = calculate_transitions(rt, temperature, model);
    if (trans_weights == NULL) { fprintf(stderr, "transitions failed\n"); return 1; }
    if (dump_trans) dump_fmat(dump_trans, trans_weights);

    const size_t nblock = trans_weights->nc;
    const size_t nparam = trans_weights->nr;

    if (model == RUNNIE_MODEL_R941_NATIVE) {
        /* runnie.c:263-311 emission */
        const size_t nbase = nbase_from_crf_runlength_nparam(nparam);
        int *path = calloc(nblock + 2, sizeof(int));
        flappie_matrix transpost = trans_weights;
        if (!viterbi_only) {
            transpost = transpost_crf_runlength(trans_weights);
            free(trans_weights);
        }
        decode_crf_runlength(transpost, path);
        fprintf(stdout, "# %s\n", rt.uuid);
        int dwell = 1;
        int last_blk = -1;
        for (size_t blk = 0; blk < nblock; blk++) {
            if (path[blk] >= (int)nbase) { dwell += 1; continue; }
            if (last_blk >= 0) {
                const size_t ofs = last_blk * transpost->stride;
                const int base = path[last_blk];
                fprintf(stdout, "%c\t%f\t%f\t%d\n", basechar(base),
                        transpost->data.f[ofs + base],
                        transpost->data.f[ofs + nbase + base], dwell);
            }
            last_blk = blk;
            dwell = 1;
        }
        if (last_blk >= 0) {
            const size_t ofs = last_blk * transpost->stride;
            const int base = path[last_blk];
            fprintf(stdout, "%c\t%f\t%f\t%d\n", basechar(base),
                    transpost->data.f[ofs + base],
                    transpost->data.f[ofs + nbase + base], dwell);
        }
        free_flappie_matrix(transpost);
        free(path);
        free_raw_table(&rt);
        return 0;
    }

    /* flip-flop: flappie.c:266-316 */
    const size_t nbase = nbase_from_flipflop_nparam(nparam);
    int *path = calloc(nblock + 2, sizeof(int));
    int *path_idx = calloc(nblock + 2, sizeof(int));
    float *qpath = calloc(nblock + 2, sizeof(float));
    int *pos = calloc(nblock + 1, sizeof(int));

    flappie_matrix posterior = trans_weights;
    if (!viterbi_only) {
        posterior = transpost_crf_flipflop(trans_weights, true);
        free(trans_weights);
    }
    float score = decode_crf_flipflop(posterior, false, path, qpath);
    size_t path_nidx = change_positions(path, nblock, path_idx);

    char *basecall = calloc(path_nidx + 1, sizeof(char));
    char *quality = calloc(path_nidx + 1, sizeof(char));
    for (size_t i = 0; i < path_nidx; i++) {
        const size_t idx = path_idx[i];
        basecall[i] = base_lookup[path[idx] % nbase];
        quality[i] = phredf(expf(qpath[idx]));
    }
    if (reverse) {
        reverse_char_array(basecall, path_nidx);
        reverse_char_array(quality, path_nidx);
    }

    exp_activation_inplace(posterior);
    flappie_imatrix trace = trace_from_posterior(posterior);
    if (dump_trace && trace) dump_imat(dump_trace, trace);
    free_flappie_matrix(posterior);

    struct _raw_basecall_info res = {
        .score = score,
        .rt = rt,
        .basecall = basecall,
        .quality = quality,
        .basecall_length = strlen(basecall),
        .trace = trace,
        .pos = pos,
        .nblock = nblock,
    };
    fprintf_format(get_outformat(formatstr), stdout, rt.uuid, readname,
                   uuid_primary, prefix, res);

    free(qpath);
    free(path_idx);
    free(path);
    free_raw_basecall_info(&res);
    return 0;
}
