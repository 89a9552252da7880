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
#include <atomic>
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

int dpx_version() { return 2; }

}  // extern "C"

// ---- native decode pipeline -------------------------------------------------
// The reference's full data path is PIL decode + torchvision transforms
// (utils.py:1440-1480). With codecs present this library owns the WHOLE
// path: libjpeg/libpng decode → crop → bilinear resize → [-1,1] normalize,
// one image per worker thread across a batch — the host-side loader keeps a
// TPU-speed harvest sweep fed without the Python pickle/PIL round-trips.
// Compiled only when the dev headers exist (DPX_WITH_CODECS from the
// Makefile probe); dpx_has_codecs() reports availability at runtime.

#ifdef DPX_WITH_CODECS

#include <csetjmp>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
    jpeg_error_mgr pub;
    jmp_buf env;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->env, 1);
}

bool decode_jpeg(FILE* f, std::vector<uint8_t>& pix, int& h, int& w, int& c) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    if (setjmp(jerr.env)) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;  // grayscale upconverts; CMYK fails out
    jpeg_start_decompress(&cinfo);
    w = cinfo.output_width;
    h = cinfo.output_height;
    c = cinfo.output_components;
    if (c != 3) {
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    pix.resize(static_cast<size_t>(h) * w * c);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = pix.data() +
            static_cast<size_t>(cinfo.output_scanline) * w * c;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return true;
}

bool decode_png(FILE* f, std::vector<uint8_t>& pix, int& h, int& w, int& c) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    if (!png) return false;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return false;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    png_set_expand(png);        // palette → rgb, low-bit gray → 8-bit
    png_set_strip_16(png);
    png_set_strip_alpha(png);
    png_set_gray_to_rgb(png);
    png_read_update_info(png, info);
    w = png_get_image_width(png, info);
    h = png_get_image_height(png, info);
    c = png_get_channels(png, info);
    if (c != 3) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    pix.resize(static_cast<size_t>(h) * w * c);
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; ++y) {
        rows[y] = pix.data() + static_cast<size_t>(y) * w * c;
    }
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    return true;
}

bool decode_file(const char* path, std::vector<uint8_t>& pix,
                 int& h, int& w, int& c) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    uint8_t magic[2] = {0, 0};
    if (std::fread(magic, 1, 2, f) != 2) {
        std::fclose(f);
        return false;
    }
    std::rewind(f);
    bool ok = false;
    if (magic[0] == 0xFF && magic[1] == 0xD8) {
        ok = decode_jpeg(f, pix, h, w, c);
    } else if (magic[0] == 0x89 && magic[1] == 'P') {
        ok = decode_png(f, pix, h, w, c);
    }
    std::fclose(f);
    return ok;
}

}  // namespace

extern "C" {

int dpx_has_codecs() { return 1; }

// decode path → center-crop → resize → normalize into dst
// (out_size × out_size × 3 f32). 0 on success, -1 on any failure (caller
// falls back to PIL).
int dpx_decode_crop_resize(const char* path, int out_size, float* dst) {
    std::vector<uint8_t> pix;
    int h = 0, w = 0, c = 0;
    if (!decode_file(path, pix, h, w, c)) return -1;
    dpx_crop_resize_normalize(pix.data(), h, w, c, dst, out_size);
    return 0;
}

// batch variant: one worker thread per image (bounded by hardware
// concurrency), per-item status (0 ok / -1 failed) so mixed batches can
// patch failures via the PIL fallback. Returns the number of failures.
int dpx_decode_batch(const char** paths, int n, int out_size, float* dst,
                     int* status) {
    int workers = static_cast<int>(std::thread::hardware_concurrency());
    if (workers <= 0) workers = 4;
    workers = std::min(workers, n);
    std::vector<std::thread> ts;
    ts.reserve(workers);
    std::atomic<int> next(0);
    size_t stride = static_cast<size_t>(out_size) * out_size * 3;
    for (int t = 0; t < workers; ++t) {
        ts.emplace_back([&] {
            for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
                status[i] = dpx_decode_crop_resize(paths[i], out_size,
                                                   dst + stride * i);
            }
        });
    }
    for (auto& th : ts) th.join();
    int fails = 0;
    for (int i = 0; i < n; ++i) fails += (status[i] != 0);
    return fails;
}

}  // extern "C"

#else  // !DPX_WITH_CODECS

extern "C" {
int dpx_has_codecs() { return 0; }
}

#endif  // DPX_WITH_CODECS
