// Native image preprocessing for the data layer.
//
// The reference's data path is PIL + torchvision transforms on the Python
// side (/root/reference/src/utils/utils.py:1440-1480); here the hot loop —
// center-crop → bilinear resize → [-1,1] normalize, and batched grid
// assembly for PNG dumps — is C++ with row-parallel threading, exposed via
// a C ABI consumed through ctypes (diffusion_pullback_tpu/utils/native.py).
// PIL remains the decode/encode codec; this library owns the pixel math so
// host-side preprocessing keeps up with the TPU at dataset-sweep scale.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float clampf(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

// bilinear sample from a HxWxC uint8 image (align_corners=false convention,
// matching PIL/torchvision Resize)
inline void sample_bilinear(const uint8_t* src, int h, int w, int c,
                            float sy, float sx, float* out) {
    float fy = sy - 0.5f;
    float fx = sx - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    int x0 = static_cast<int>(std::floor(fx));
    float wy = fy - y0;
    float wx = fx - x0;
    int y1 = std::min(y0 + 1, h - 1);
    int x1 = std::min(x0 + 1, w - 1);
    y0 = std::max(y0, 0);
    x0 = std::max(x0, 0);
    const uint8_t* p00 = src + (static_cast<size_t>(y0) * w + x0) * c;
    const uint8_t* p01 = src + (static_cast<size_t>(y0) * w + x1) * c;
    const uint8_t* p10 = src + (static_cast<size_t>(y1) * w + x0) * c;
    const uint8_t* p11 = src + (static_cast<size_t>(y1) * w + x1) * c;
    for (int ch = 0; ch < c; ++ch) {
        float top = p00[ch] * (1 - wx) + p01[ch] * wx;
        float bot = p10[ch] * (1 - wx) + p11[ch] * wx;
        out[ch] = top * (1 - wy) + bot * wy;
    }
}

int hw_threads() {
    unsigned n = std::thread::hardware_concurrency();
    return n == 0 ? 1 : static_cast<int>(n);
}

template <typename Fn>
void parallel_rows(int rows, Fn&& fn) {
    int nt = std::min(hw_threads(), rows);
    if (nt <= 1) {
        for (int y = 0; y < rows; ++y) fn(y);
        return;
    }
    std::vector<std::thread> ts;
    ts.reserve(nt);
    int chunk = (rows + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int y0 = t * chunk;
        int y1 = std::min(rows, y0 + chunk);
        if (y0 >= y1) break;
        ts.emplace_back([y0, y1, &fn] {
            for (int y = y0; y < y1; ++y) fn(y);
        });
    }
    for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// center-crop the largest square, bilinear-resize to out_size, scale to
// [-1, 1]. src: HxWxC uint8 (C-contiguous); dst: out_size x out_size x C f32.
void dpx_crop_resize_normalize(const uint8_t* src, int h, int w, int c,
                               float* dst, int out_size) {
    int side = std::min(h, w);
    int top = (h - side) / 2;
    int left = (w - side) / 2;
    float scale = static_cast<float>(side) / out_size;
    parallel_rows(out_size, [&](int oy) {
        float sy = top + (oy + 0.5f) * scale;
        float* row = dst + static_cast<size_t>(oy) * out_size * c;
        std::vector<float> px(c);
        for (int ox = 0; ox < out_size; ++ox) {
            float sx = left + (ox + 0.5f) * scale;
            sample_bilinear(src, h, w, c, sy, sx, px.data());
            for (int ch = 0; ch < c; ++ch) {
                row[ox * c + ch] = px[ch] * (2.0f / 255.0f) - 1.0f;
            }
        }
    });
}

// [-1,1] f32 NHWC batch -> uint8 grid image (rows = ceil(n/nrow)).
// grid must be (ceil(n/nrow)*h) x (nrow*w) x c uint8, zero-filled by caller
// or here.
void dpx_batch_to_grid_u8(const float* batch, int n, int h, int w, int c,
                          int nrow, uint8_t* grid) {
    int ncol = (n + nrow - 1) / nrow;
    size_t grid_w = static_cast<size_t>(nrow) * w;
    std::memset(grid, 0, static_cast<size_t>(ncol) * h * grid_w * c);
    parallel_rows(n, [&](int i) {
        int r = i / nrow;
        int col = i % nrow;
        const float* img = batch + static_cast<size_t>(i) * h * w * c;
        for (int y = 0; y < h; ++y) {
            uint8_t* dst = grid +
                ((static_cast<size_t>(r) * h + y) * grid_w + static_cast<size_t>(col) * w) * c;
            const float* srcrow = img + static_cast<size_t>(y) * w * c;
            for (int k = 0; k < w * c; ++k) {
                float v = clampf(srcrow[k] * 0.5f + 0.5f, 0.0f, 1.0f);
                dst[k] = static_cast<uint8_t>(std::lround(v * 255.0f));
            }
        }
    });
}

int dpx_version() { return 1; }

}  // extern "C"
