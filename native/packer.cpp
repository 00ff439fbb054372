// Native epoch packer for MultiModN-TPU's data path.
//
// The framework feeds the TPU whole-epoch batch stacks (see
// multimodn_tpu/data/loader.py): per-modality (n_batches, B, F_m) arrays with
// a padded tail, a (n_batches, B) sample mask, and per-(sample, modality)
// NaN-validity. The reference does the equivalent per batch in Python
// (torch DataLoader collation + .to(device), multimodn.py:132-135). This
// translation unit performs the entire epoch layout in one pass over the
// source matrix: gather rows in permutation order, scatter each modality's
// columns into its stack, record NaN validity while the data is hot in
// cache, and zero the padded tail.
//
// Also provides an in-place NaN-aware column standardizer (sklearn
// StandardScaler semantics with ddof=0, NaNs ignored in fit and preserved
// in transform) so dataset construction avoids a second full pass through
// pandas.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cmath>
#include <cstring>

extern "C" {

// X:        (n, f) row-major float32 source matrix (NaNs allowed)
// order:    (n,) row permutation to apply while packing
// offsets:  (m,) column offset of each modality block
// widths:   (m,) width of each modality block
// blocks:   m pointers, each to a preallocated (n_batches * batch * width_m)
//           float32 buffer (zero-init NOT required; fully written here)
// mask:     (n_batches * batch) float32 — 1 for real rows, 0 for padding
// valid:    (n_batches * batch * m) float32 — 1 where the sample's modality
//           block contains no NaN (per-sample missingness mask)
void pack_epoch(const float* X,
                int64_t n, int64_t f,
                const int64_t* order,
                const int64_t* offsets,
                const int64_t* widths,
                int64_t m,
                int64_t batch, int64_t n_batches,
                float** blocks,
                float* mask,
                float* valid) {
    const int64_t total = n_batches * batch;
    for (int64_t i = 0; i < total; ++i) {
        const bool real = i < n;
        mask[i] = real ? 1.0f : 0.0f;
        const float* src = real ? X + order[i] * f : nullptr;
        for (int64_t mod = 0; mod < m; ++mod) {
            const int64_t w = widths[mod];
            float* dst = blocks[mod] + i * w;
            if (!real) {
                std::memset(dst, 0, sizeof(float) * w);
                valid[i * m + mod] = 0.0f;
                continue;
            }
            const float* col = src + offsets[mod];
            bool has_nan = false;
            for (int64_t j = 0; j < w; ++j) {
                const float v = col[j];
                has_nan |= std::isnan(v);
                dst[j] = v;
            }
            valid[i * m + mod] = has_nan ? 0.0f : 1.0f;
        }
    }
}

// In-place per-column z-score: mean/std computed ignoring NaNs (population
// std, ddof=0 — sklearn StandardScaler), NaN entries left as NaN, zero-std
// columns left centered (divide by 1), matching sklearn's scale_=1 rule.
void standardize_columns(float* X, int64_t n, int64_t f) {
    for (int64_t j = 0; j < f; ++j) {
        double sum = 0.0, sq = 0.0;
        int64_t count = 0;
        for (int64_t i = 0; i < n; ++i) {
            const float v = X[i * f + j];
            if (!std::isnan(v)) {
                sum += v;
                sq += static_cast<double>(v) * v;
                ++count;
            }
        }
        if (count == 0) continue;
        const double mean = sum / count;
        double var = sq / count - mean * mean;
        if (var < 0.0) var = 0.0;
        double scale = std::sqrt(var);
        if (scale == 0.0) scale = 1.0;
        const float fm = static_cast<float>(mean);
        const float fs = static_cast<float>(1.0 / scale);
        for (int64_t i = 0; i < n; ++i) {
            float& v = X[i * f + j];
            if (!std::isnan(v)) v = (v - fm) * fs;
        }
    }
}

}  // extern "C"
