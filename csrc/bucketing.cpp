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
// out/mask are (n_src, *max_shape) pre-filled with the pad value.  This is
// the host data-plane hot loop of the padding subsystem (the reference does
// these copies with a per-tensor CUDA kernel + device pointer tables,
// src/rl_utils/padding.cu:111-229; on TPU the pack happens host-side before
// one transfer).
void pack_padded_f32(const float** srcs, const int64_t* shapes, int64_t n_src,
                     int64_t ndim, const int64_t* max_shape,
                     float* out, float* mask) {
    // Row-major strides of the padded (per-sample) block.
    std::vector<int64_t> stride(ndim);
    int64_t s = 1;
    for (int64_t d = ndim - 1; d >= 0; --d) { stride[d] = s; s *= max_shape[d]; }
    const int64_t sample_sz = s;

    for (int64_t i = 0; i < n_src; ++i) {
        const int64_t* shp = shapes + i * ndim;
        const float* src = srcs[i];
        float* dst = out + i * sample_sz;
        float* msk = mask + i * sample_sz;
        const int64_t inner = shp[ndim - 1];
        // Iterate over all outer index tuples of the source tensor.
        int64_t outer = 1;
        for (int64_t d = 0; d < ndim - 1; ++d) outer *= shp[d];
        std::vector<int64_t> idx(ndim - 1, 0);
        for (int64_t o = 0; o < outer; ++o) {
            int64_t off = 0;
            for (int64_t d = 0; d < ndim - 1; ++d) off += idx[d] * stride[d];
            std::memcpy(dst + off, src + o * inner, inner * sizeof(float));
            for (int64_t k = 0; k < inner; ++k) msk[off + k] = 1.0f;
            for (int64_t d = ndim - 2; d >= 0; --d) {
                if (++idx[d] < shp[d]) break;
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
