// Native host-side bucketing core for ragged-batch padding.
//
// TPU-native equivalent of the reference's C++ host bucketing
// (/root/reference/src/rl_utils/padding.cu:8-108): the exact DP that splits a
// numel-sorted list of N tensors into M buckets minimizing total padded cost
// (cost of a bucket [s, e] = numel[e] * (e - s + 1)).  O(M*N^2) time, O(M*N)
// space — this is host control-plane work, so it is plain C++ (no device
// code); the padded copies themselves are device-side jnp ops.
//
// Exposed via a C ABI for ctypes.  A pure-Python fallback with identical
// semantics lives in di_hpc_tpu/origin/padding.py.

#include <cstdint>
#include <cstring>
#include <vector>
#include <limits>

extern "C" {

// Ragged pack: copy n_src tensors (row-major, float32) into a padded dense
// batch and write the validity mask.  Shapes are (n_src, ndim) row-major;
// out/mask are (n_src, *max_shape) UNINITIALIZED — this routine writes every
// element exactly once (valid data, pad fill, and mask), so callers pass
// np.empty, not np.full.  The single-touch contract is the point: the r4
// variant required a Python-side np.full prefill of both arrays and then
// re-wrote the valid regions (plus a scalar per-element mask loop), which
// cost one extra full pass over 2x the payload and lost to numpy
// slice-assigns at the 2D bench config (1415 vs 1130 us, driver r4).  This
// is the host data-plane hot loop of the padding subsystem (the reference
// does these copies with a per-tensor CUDA kernel + device pointer tables,
// src/rl_utils/padding.cu:111-229; on TPU the pack happens host-side before
// one transfer).
void pack_padded_f32(const float** srcs, const int64_t* shapes, int64_t n_src,
                     int64_t ndim, const int64_t* max_shape, float value,
                     float* out, float* mask) {
    int64_t sample_sz = 1;
    for (int64_t d = 0; d < ndim; ++d) sample_sz *= max_shape[d];
    const int64_t max_inner = max_shape[ndim - 1];

    for (int64_t i = 0; i < n_src; ++i) {
        const int64_t* shp = shapes + i * ndim;
        const float* src = srcs[i];
        float* dst = out + i * sample_sz;
        float* msk = mask + i * sample_sz;
        const int64_t inner = shp[ndim - 1];
        // Walk all outer index tuples of the PADDED block in row-major
        // order (dst/msk rows are contiguous), emitting each padded row in
        // one pass: a memcpy of the valid prefix + a fill of the tail when
        // the tuple lies inside the source extent, or a full-row fill when
        // it lies in the padding.
        int64_t max_outer = 1;
        for (int64_t d = 0; d < ndim - 1; ++d) max_outer *= max_shape[d];
        std::vector<int64_t> idx(ndim - 1, 0);
        int64_t src_off = 0;
        for (int64_t o = 0; o < max_outer; ++o) {
            float* drow = dst + o * max_inner;
            float* mrow = msk + o * max_inner;
            bool in_src = true;
            for (int64_t d = 0; d < ndim - 1; ++d)
                in_src = in_src && (idx[d] < shp[d]);
            if (in_src) {
                std::memcpy(drow, src + src_off, inner * sizeof(float));
                std::fill(drow + inner, drow + max_inner, value);
                std::fill(mrow, mrow + inner, 1.0f);
                std::fill(mrow + inner, mrow + max_inner, value);
                src_off += inner;
            } else {
                std::fill(drow, drow + max_inner, value);
                std::fill(mrow, mrow + max_inner, value);
            }
            for (int64_t d = ndim - 2; d >= 0; --d) {
                if (++idx[d] < max_shape[d]) break;
                idx[d] = 0;
            }
        }
    }
}

// numels: ascending numel per tensor, length n (1-indexed internally).
// positions_out: length group+1; positions_out[0] = 0, positions_out[group] = n.
// Returns the minimal total padded cost, or -1 on infeasible input.
int64_t oracle_split_group(const int64_t* numels, int64_t n, int64_t group,
                           int64_t* positions_out) {
    if (n <= 0 || group <= 0 || group > n) return -1;
    const int64_t INF = std::numeric_limits<int64_t>::max() / 4;

    // f[j][i] = min cost of covering the first i tensors with j buckets.
    // parent[j][i] = split point k (last bucket is (k, i]).
    std::vector<std::vector<int64_t>> f(group + 1, std::vector<int64_t>(n + 1, INF));
    std::vector<std::vector<int64_t>> parent(group + 1, std::vector<int64_t>(n + 1, -1));
    f[0][0] = 0;

    for (int64_t i = 1; i <= n; ++i) {
        const int64_t numel_i = numels[i - 1];
        for (int64_t j = 1; j <= group; ++j) {
            int64_t best = INF, best_k = -1;
            for (int64_t k = 0; k < i; ++k) {
                if (f[j - 1][k] >= INF) continue;
                const int64_t cost = f[j - 1][k] + numel_i * (i - k);
                if (cost < best) { best = cost; best_k = k; }
            }
            f[j][i] = best;
            parent[j][i] = best_k;
        }
    }

    if (f[group][n] >= INF) return -1;

    int64_t pos = n;
    for (int64_t j = group; j >= 1; --j) {
        positions_out[j] = pos;
        pos = parent[j][pos];
    }
    positions_out[0] = 0;
    return f[group][n];
}

}  // extern "C"
