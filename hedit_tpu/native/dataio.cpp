// Native data-path kernels for the host-side pipeline.
//
// The PieBench sweep feeds 700 images through center-crop/resize +
// normalization and decodes run-length edit masks per sample
// (reference behavior: p2p/ptp_classes.py:351-372 load_512;
// evaluation/evaluation.py:9-25 mask_decode).  These run on the host while
// the TPU computes; this OpenMP-parallel C++ implementation keeps the input
// pipeline off the critical path for large sweeps.
//
// Exposed via ctypes (hedit_tpu/io_utils/native.py) with a pure-Python
// fallback when the shared object is unavailable.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <utility>
#include <vector>

extern "C" {

// RLE mask decode with border forcing (evaluation.py:9-25 semantics).
// runs: [start0, len0, start1, len1, ...]; out: size*size floats.
void rle_decode(const int64_t* runs, int n_pairs, float* out, int size) {
    const int64_t total = (int64_t)size * size;
    std::memset(out, 0, sizeof(float) * total);
    for (int i = 0; i < n_pairs; ++i) {
        int64_t start = runs[2 * i];
        int64_t len = runs[2 * i + 1];
        if (start < 0 || start >= total) continue;
        len = std::min(len, total - start);
        for (int64_t j = 0; j < len; ++j) out[start + j] = 1.0f;
    }
    for (int x = 0; x < size; ++x) {
        out[x] = 1.0f;                          // top row
        out[(int64_t)(size - 1) * size + x] = 1.0f;  // bottom row
        out[(int64_t)x * size] = 1.0f;          // left col
        out[(int64_t)x * size + size - 1] = 1.0f;    // right col
    }
}

// Catmull-Rom cubic kernel, a = -0.5 (PIL BICUBIC parity).
static inline float cubic(float x) {
    const float a = -0.5f;
    x = std::fabs(x);
    if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
    if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
    return 0.0f;
}

// Center-crop to square then bicubic-resize to out x out, scaling uint8 RGB
// to float32 in [-1, 1] (load_512 semantics).
void crop_resize_normalize(const uint8_t* img, int h, int w,
                           float* out, int out_size) {
    int side = std::min(h, w);
    int top = 0, left = 0;
    if (h < w) left = (w - side) / 2;       // crop the long axis only
    else if (w < h) top = (h - side) / 2;

    const float scale = (float)side / (float)out_size;
#pragma omp parallel for
    for (int oy = 0; oy < out_size; ++oy) {
        float sy = (oy + 0.5f) * scale - 0.5f;
        int y0 = (int)std::floor(sy) - 1;
        float wy[4];
        for (int k = 0; k < 4; ++k) wy[k] = cubic(sy - (y0 + k));
        for (int ox = 0; ox < out_size; ++ox) {
            float sx = (ox + 0.5f) * scale - 0.5f;
            int x0 = (int)std::floor(sx) - 1;
            float wx[4];
            for (int k = 0; k < 4; ++k) wx[k] = cubic(sx - (x0 + k));
            for (int c = 0; c < 3; ++c) {
                float acc = 0.0f, wsum = 0.0f;
                for (int ky = 0; ky < 4; ++ky) {
                    int yy = std::clamp(y0 + ky, 0, side - 1) + top;
                    for (int kx = 0; kx < 4; ++kx) {
                        int xx = std::clamp(x0 + kx, 0, side - 1) + left;
                        float wgt = wy[ky] * wx[kx];
                        acc += wgt * img[((int64_t)yy * w + xx) * 3 + c];
                        wsum += wgt;
                    }
                }
                float v = acc / wsum;
                out[((int64_t)oy * out_size + ox) * 3 + c] =
                    v / 127.5f - 1.0f;
            }
        }
    }
}

// Needleman-Wunsch global alignment (seq_aligner semantics: gap 0, match 1,
// mismatch -1; traceback tie order left > up > diag).  Writes the y->x
// mapper pairs; returns the number of pairs.
int nw_align(const int64_t* x, int nx, const int64_t* y, int ny,
             int64_t* mapper_out /* [ny*2] */) {
    const int gap = 0, match = 1, mismatch = -1;
    std::vector<int> m((nx + 1) * (ny + 1), 0);
    std::vector<int8_t> tb((nx + 1) * (ny + 1), 0);
    auto M = [&](int i, int j) -> int& { return m[i * (ny + 1) + j]; };
    auto T = [&](int i, int j) -> int8_t& { return tb[i * (ny + 1) + j]; };
    for (int j = 1; j <= ny; ++j) { M(0, j) = j * gap; T(0, j) = 1; }
    for (int i = 1; i <= nx; ++i) { M(i, 0) = i * gap; T(i, 0) = 2; }
    T(0, 0) = 4;
    for (int i = 1; i <= nx; ++i) {
        for (int j = 1; j <= ny; ++j) {
            int left = M(i, j - 1) + gap;
            int up = M(i - 1, j) + gap;
            int diag = M(i - 1, j - 1) + (x[i - 1] == y[j - 1] ? match : mismatch);
            int best = std::max(left, std::max(up, diag));
            M(i, j) = best;
            if (best == left) T(i, j) = 1;
            else if (best == up) T(i, j) = 2;
            else T(i, j) = 3;
        }
    }
    int i = nx, j = ny, n = 0;
    // collect reversed, then flip
    std::vector<std::pair<int64_t, int64_t>> pairs;
    while (i > 0 || j > 0) {
        int8_t t = T(i, j);
        if (t == 3) { --i; --j; pairs.push_back({j, i}); }
        else if (t == 1) { --j; pairs.push_back({j, -1}); }
        else if (t == 2) { --i; }
        else break;
    }
    for (auto it = pairs.rbegin(); it != pairs.rend(); ++it) {
        mapper_out[2 * n] = it->first;
        mapper_out[2 * n + 1] = it->second;
        ++n;
    }
    return n;
}

}  // extern "C"
