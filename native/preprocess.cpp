// flappie-tpu native host runtime: signal preprocessing.
//
// The device (TPU) does the network + decode; the host must keep up
// with per-read preprocessing: variance-based trimming and med-MAD
// normalisation (reference semantics: src/util.c:100-233,
// src/flappie_common.c:13-81).  This is the C++ equivalent of the
// reference's C99 preprocessing, with a thread-pool batch API so one
// process can feed a fast chip.
//
// Float semantics match the C code exactly (float32 storage, the same
// mixed float/double expressions), so outputs are bit-identical to the
// Python reference implementation in flappie_tpu/signal/preprocess.py,
// which is itself validated against the reference goldens.
//
// C ABI only (consumed via ctypes).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// quantile with linear interpolation (reference src/util.c:100-138).
//
// The reference qsorts the whole copy; only space[idx] and
// space[idx+1] of the sorted order are ever read, so selection via
// std::nth_element + a min over the right partition produces the SAME
// values (selection is exact -- no float arithmetic is involved in
// ordering) at O(n) instead of O(n log n).  med-MAD normalisation
// calls this three times per read, which made the full sort the
// largest single host phase in the round-4 soak (docs/SOAK_r4.json).
float quantilef(const float* x, size_t nx, float p) {
    std::vector<float> space(x, x + nx);
    const float prod = p * (float)(nx - 1);   // float arithmetic, as C
    const size_t idx = (size_t)prod;          // truncation
    const float remf = prod - (float)idx;
    std::nth_element(space.begin(), space.begin() + idx, space.end());
    if (idx < nx - 1) {
        const float hi = *std::min_element(space.begin() + idx + 1,
                                           space.end());
        // C: (1.0 - remf) * space[idx] + remf * space[idx + 1] in double
        return (float)((1.0 - (double)remf) * (double)space[idx] +
                       (double)remf * (double)hi);
    }
    return space[idx];
}

float medianf(const float* x, size_t n) { return quantilef(x, n, 0.5f); }

// MAD * 1.4826 (reference src/util.c:164-196)
float madf(const float* x, size_t n, const float* med) {
    const float mad_scaling_factor = 1.4826f;
    if (n == 1) return 0.0f;
    const float m = med ? *med : medianf(x, n);
    std::vector<float> absdiff(n);
    for (size_t i = 0; i < n; ++i) absdiff[i] = std::fabs(x[i] - m);
    const float mad = medianf(absdiff.data(), n);
    return mad * mad_scaling_factor;  // float multiply, as C
}

}  // namespace

extern "C" {

// med-MAD normalise in place (src/util.c:198-213); optionally reports
// the (med, mad) scalars so callers can replay the normalisation on
// device from raw ADC counts (half the upload bytes).
void ft_medmad_normalise2(float* x, int64_t n, float* med_out, float* mad_out) {
    if (med_out) *med_out = 0.0f;
    if (mad_out) *mad_out = 0.0f;
    if (!x) return;
    if (n == 1) { x[0] = 0.0f; return; }
    const float med = medianf(x, (size_t)n);
    const float mad = madf(x, (size_t)n, &med);
    for (int64_t i = 0; i < n; ++i) x[i] = (x[i] - med) / mad;
    if (med_out) *med_out = med;
    if (mad_out) *mad_out = mad;
}

void ft_medmad_normalise(float* x, int64_t n) {
    ft_medmad_normalise2(x, n, nullptr, nullptr);
}

// delta mode: difference + scale (src/util.c:278-289, 215-224)
void ft_difference_scale(float* x, int64_t n, float shift, float scale) {
    if (!x || n == 0) return;
    for (int64_t i = 1; i < n; ++i) x[i - 1] = x[i] - x[i - 1];
    x[n - 1] = 0.0f;
    for (int64_t i = 0; i < n; ++i) x[i] = (x[i] - shift) / scale;
}

// trim_raw_by_mad + fixed trims (src/flappie_common.c:13-81).
// On entry *start/*end delimit the active window; on exit they hold the
// trimmed window, or start==end if nothing remains.
void ft_trim_and_segment(const float* raw, int64_t n,
                         int64_t trim_start, int64_t trim_end,
                         int64_t varseg_chunk, float varseg_thresh,
                         int64_t* start_io, int64_t* end_io) {
    int64_t start = *start_io, end = *end_io;
    const int64_t nsample = end - start;
    const int64_t nchunk = varseg_chunk > 0 ? nsample / varseg_chunk : 0;
    if (nchunk == 0) { *start_io = *end_io = 0; return; }
    end = nchunk * varseg_chunk;  // reference truncation quirk

    std::vector<float> madarr((size_t)nchunk);
    for (int64_t i = 0; i < nchunk; ++i)
        madarr[(size_t)i] =
            madf(raw + start + i * varseg_chunk, (size_t)varseg_chunk, nullptr);
    const float thresh = quantilef(madarr.data(), (size_t)nchunk, varseg_thresh);

    for (int64_t i = 0; i < nchunk; ++i) {
        if (madarr[(size_t)i] > thresh) break;
        start += varseg_chunk;
    }
    for (int64_t i = nchunk; i > 0; --i) {
        if (madarr[(size_t)(i - 1)] > thresh) break;
        end -= varseg_chunk;
    }

    // fixed trims (src/flappie_common.c:20-26)
    start = (n - start) > trim_start ? start + trim_start : n;
    end = (end > trim_end) ? end - trim_end : 0;
    if (start >= end) { *start_io = *end_io = 0; return; }
    *start_io = start;
    *end_io = end;
}

// Batch API: preprocess many reads on a thread pool.
//
// signals: concatenated float32 signal; offsets[i]..offsets[i+1]
// delimit read i (i in [0, nreads)).  On return starts/ends hold each
// read's trimmed window (relative to its own offset; start==end means
// the read failed) and the signal within the window is normalised in
// place (med-MAD, or delta mode when delta != 0).
// v2 additionally reports each read's (med, mad) normalisation scalars
// (0/0 in delta mode or for failed reads).
void ft_preprocess_batch2(float* signals, const int64_t* offsets,
                          int64_t nreads,
                          int64_t trim_start, int64_t trim_end,
                          int64_t varseg_chunk, float varseg_thresh,
                          float delta,
                          int64_t* starts, int64_t* ends,
                          float* meds, float* mads,
                          int32_t nthreads) {
    if (nthreads <= 0) {
        nthreads = (int32_t)std::thread::hardware_concurrency();
        if (nthreads <= 0) nthreads = 1;
    }
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        for (;;) {
            const int64_t i = next.fetch_add(1);
            if (i >= nreads) return;
            float* raw = signals + offsets[i];
            const int64_t n = offsets[i + 1] - offsets[i];
            int64_t start = 0, end = n;
            ft_trim_and_segment(raw, n, trim_start, trim_end, varseg_chunk,
                                varseg_thresh, &start, &end);
            starts[i] = start;
            ends[i] = end;
            if (meds) meds[i] = 0.0f;
            if (mads) mads[i] = 0.0f;
            if (start >= end) continue;
            if (delta == 0.0f) {
                ft_medmad_normalise2(raw + start, end - start,
                                     meds ? meds + i : nullptr,
                                     mads ? mads + i : nullptr);
            } else {
                ft_difference_scale(raw + start, end - start, 0.0f, delta);
            }
        }
    };
    std::vector<std::thread> pool;
    const int32_t nt = std::min<int64_t>(nthreads, nreads > 0 ? nreads : 1);
    pool.reserve((size_t)nt);
    for (int32_t t = 0; t < nt; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
}

void ft_preprocess_batch(float* signals, const int64_t* offsets,
                         int64_t nreads,
                         int64_t trim_start, int64_t trim_end,
                         int64_t varseg_chunk, float varseg_thresh,
                         float delta,
                         int64_t* starts, int64_t* ends,
                         int32_t nthreads) {
    ft_preprocess_batch2(signals, offsets, nreads, trim_start, trim_end,
                         varseg_chunk, varseg_thresh, delta, starts, ends,
                         nullptr, nullptr, nthreads);
}

// Scale ADC counts to pA in place (src/fast5_interface.c:297-303)
void ft_scale_to_pA(float* x, int64_t n, float offset, float range,
                    float digitisation) {
    const float raw_unit = range / digitisation;
    for (int64_t i = 0; i < n; ++i) x[i] = (x[i] + offset) * raw_unit;
}

// delta-int8 ("d8") upload encode: the native counterpart of
// flappie_tpu.basecall.encode_d8 (bit-identical output layout).
//
// In:  buf  [B, Wt] int16 rows in the pack_chunk_inputs_i16 layout
//      (W = Wt - 16 ADC samples + 16 tail int16).
// Out: out  [B, W + 6*exc + 32] int8 rows, exc = ceil(W/64):
//      W clipped deltas | exc int32 LE exception indices | exc int16 LE
//      corrections | the 16 tail int16 as raw bytes.
// Returns 0 on success; 1 if ANY row needs more than exc exception
// slots or a correction exceeds int16 (caller ships the i16 wire
// instead -- all-or-nothing per batch, matching the Python encoder).
//
// This is the host-side O(B*W) pass that showed up as a single-core
// bottleneck in the round-3 soak; rows encode on worker threads
// spawned per call (threads are capped at one per 16 rows so a
// many-core host does not pay ~hardware_concurrency create+join
// overheads for a 128-row batch whose useful parallelism is far
// smaller).
int32_t ft_encode_d8(const int16_t* buf, int64_t B, int64_t Wt,
                     int8_t* out, int32_t nthreads) {
    const int64_t W = Wt - 16;
    const int64_t exc = (W + 63) / 64;
    const int64_t out_w = W + 6 * exc + 32;
    if (nthreads <= 0) {
        nthreads = (int32_t)std::thread::hardware_concurrency();
        if (nthreads <= 0) nthreads = 1;
    }
    const int64_t useful = (B + 15) / 16;  // >=16 rows per thread
    if (nthreads > useful) nthreads = (int32_t)useful;
    std::atomic<int64_t> next(0);
    std::atomic<bool> failed(false);
    auto worker = [&]() {
        std::vector<int32_t> idx((size_t)exc);
        std::vector<int16_t> corr((size_t)exc);
        for (;;) {
            if (failed.load(std::memory_order_relaxed)) return;
            const int64_t i = next.fetch_add(1);
            if (i >= B) return;
            const int16_t* row = buf + i * Wt;
            int8_t* o = out + i * out_w;
            int64_t nexc = 0;
            int32_t prev = 0;
            for (int64_t j = 0; j < W; ++j) {
                const int32_t d = (int32_t)row[j] - prev;
                const int32_t s = d < -128 ? -128 : (d > 127 ? 127 : d);
                o[j] = (int8_t)s;
                const int32_t e = d - s;
                if (e != 0) {
                    if (nexc == exc || e < -32767 || e > 32767) {
                        failed.store(true, std::memory_order_relaxed);
                        return;
                    }
                    idx[(size_t)nexc] = (int32_t)j;
                    corr[(size_t)nexc] = (int16_t)e;
                    ++nexc;
                }
                prev = (int32_t)row[j];
            }
            for (; nexc < exc; ++nexc) {
                idx[(size_t)nexc] = (int32_t)W;  // unused: out of range
                corr[(size_t)nexc] = 0;
            }
            // unaligned destinations: memcpy (little-endian layout, the
            // exact bytes numpy's .view(np.int8) produces)
            std::memcpy(o + W, idx.data(), (size_t)(4 * exc));
            std::memcpy(o + W + 4 * exc, corr.data(), (size_t)(2 * exc));
            std::memcpy(o + W + 6 * exc, row + W, 32);
        }
    };
    std::vector<std::thread> pool;
    const int32_t nt = (int32_t)std::min<int64_t>(nthreads, B > 0 ? B : 1);
    pool.reserve((size_t)nt);
    for (int32_t t = 0; t < nt; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    return failed.load() ? 1 : 0;
}

int32_t ft_version(void) { return 3; }

}  // extern "C"
