// Native host-side runtime for dynamont-tpu.
//
// The TPU computes the DP matrices (posterior probabilities + Viterbi choice
// bits); what remains on the host per read is inherently sequential pointer
// chasing and light streaming work, which is what lives here:
//   * banded MAP traceback  (ref: src/cpp/NT_banded.cpp:204-250)
//   * full-lattice MAP traceback (ref: src/cpp/NT.cpp:146-177)
//
// Exposed as a plain C ABI consumed through ctypes (no pybind11 in this
// image). Batch entry points parallelize across reads with OpenMP.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Median of v[0..n) with the reference semantics (sort; odd -> middle,
// even -> mean of the two middles). Scratch is caller-provided.
static double median_of(double *v, int64_t n) {
    std::sort(v, v + n);
    if (n % 2 == 1) return v[n / 2];
    return (v[n / 2 - 1] + v[n / 2]) / 2.0;
}

// Banded traceback for one read.
//   choices: (T_pad, B) uint8 Viterbi predicate bits
//   PM, PE : (T_pad, B) float32 posterior probabilities
//   bstart : (T_pad,) int32 band starts
// Returns the number of segments written; out arrays must hold >= N entries.
// Segments are emitted in read order (basepos ascending).
int64_t banded_traceback(const uint8_t *choices, const float *PM,
                         const float *PE, const int32_t *bstart, int64_t B,
                         int64_t T, int64_t N, int64_t bw, int64_t kmer_half,
                         int32_t *out_basepos, int32_t *out_start,
                         double *out_median) {
    std::vector<double> probs;
    probs.reserve(1024);
    int64_t t = T - 1, n = N - 1, j = bw + 1;
    bool is_m = false;
    int64_t nseg = 0;
    while (t && n) {
        const int64_t s = (bstart[t] != bstart[t - 1]) ? 1 : 0;
        if (is_m) {
            probs.push_back((double)PM[t * B + j]);
            out_basepos[nseg] = (int32_t)(n - 1 + kmer_half);
            out_start[nseg] = (int32_t)(t - 1);
            out_median[nseg] = median_of(probs.data(), (int64_t)probs.size());
            ++nseg;
            probs.clear();
            --t;
            --n;
            j = j - 1 + s;
            is_m = false;
        } else {
            probs.push_back((double)PE[t * B + j]);
            is_m = choices[t * B + j] != 0;
            --t;
            j = j + s;
        }
    }
    // reverse into read order
    for (int64_t a = 0, b = nseg - 1; a < b; ++a, --b) {
        std::swap(out_basepos[a], out_basepos[b]);
        std::swap(out_start[a], out_start[b]);
        std::swap(out_median[a], out_median[b]);
    }
    return nseg;
}

// Batched banded traceback over R reads with OpenMP.
// All per-read matrices are slices of one (R, T_pad, B) block; per-read true
// sizes come from the T/N/bw arrays. out_counts[r] receives the segment count
// and the segment arrays are written at offset r*max_segments.
void banded_traceback_batch(const uint8_t *choices, const float *PM,
                            const float *PE, const int32_t *bstart,
                            int64_t R, int64_t T_pad, int64_t B,
                            const int32_t *T, const int32_t *N,
                            const int32_t *bw, int64_t kmer_half,
                            int64_t max_segments, int32_t *out_basepos,
                            int32_t *out_start, double *out_median,
                            int64_t *out_counts) {
#pragma omp parallel for schedule(dynamic)
    for (int64_t r = 0; r < R; ++r) {
        out_counts[r] = banded_traceback(
            choices + r * T_pad * B, PM + r * T_pad * B, PE + r * T_pad * B,
            bstart + r * T_pad, B, T[r], N[r], bw[r], kmer_half,
            out_basepos + r * max_segments, out_start + r * max_segments,
            out_median + r * max_segments);
    }
}

// Full-lattice traceback (ref: NT.cpp:146-177). Matrices are (T, N) row-major.
int64_t nt_traceback(const uint8_t *choices, const float *PM, const float *PE,
                     int64_t T, int64_t N, int64_t kmer_half,
                     int32_t *out_basepos, int32_t *out_start,
                     double *out_median) {
    std::vector<double> probs;
    probs.reserve(1024);
    int64_t t = T - 1, n = N - 1;
    bool is_m = false;
    int64_t nseg = 0;
    while (t && n) {
        if (is_m) {
            probs.push_back((double)PM[t * N + n]);
            out_basepos[nseg] = (int32_t)(n - 1 + kmer_half);
            out_start[nseg] = (int32_t)(t - 1);
            out_median[nseg] = median_of(probs.data(), (int64_t)probs.size());
            ++nseg;
            probs.clear();
            --t;
            --n;
            is_m = false;
        } else {
            probs.push_back((double)PE[t * N + n]);
            is_m = choices[t * N + n] != 0;
            --t;
        }
    }
    for (int64_t a = 0, b = nseg - 1; a < b; ++a, --b) {
        std::swap(out_basepos[a], out_basepos[b]);
        std::swap(out_start[a], out_start[b]);
        std::swap(out_median[a], out_median[b]);
    }
    return nseg;
}

}  // extern "C"
