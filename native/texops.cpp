// Native texture pipeline for vk_renderer_tpu (host/load-time runtime).
//
// The TPU-native counterpart of the reference's GPU-side texture plumbing:
// RGBA8 staging-upload + sRGB hardware decode (vk_loader.cpp create_image)
// and the vkCmdBlitImage linear-filter mip chain (vk_images.cpp:64-158),
// done once at scene load on the host instead of per-texture GPU
// round-trips.  Exposed via a plain C ABI for ctypes; the Python side
// (scene/textures.py) keeps a NumPy fallback with identical outputs.
//
// Build: cc -O3 -march=native -shared -fPIC texops.cpp -o libtexops.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

float srgb_lut[256];
bool lut_ready = false;

void ensure_lut() {
    if (lut_ready) return;
    for (int i = 0; i < 256; ++i) {
        float c = i / 255.0f;
        srgb_lut[i] = (c <= 0.04045f) ? c / 12.92f
                                      : std::pow((c + 0.055f) / 1.055f, 2.4f);
    }
    lut_ready = true;
}

}  // namespace

extern "C" {

// RGBA8 -> f32 RGBA, optionally sRGB-decoding RGB (alpha always linear).
void decode_rgba8(const uint8_t* src, float* dst, int64_t n_pixels, int srgb) {
    ensure_lut();
    if (srgb) {
        for (int64_t i = 0; i < n_pixels; ++i) {
            dst[4 * i + 0] = srgb_lut[src[4 * i + 0]];
            dst[4 * i + 1] = srgb_lut[src[4 * i + 1]];
            dst[4 * i + 2] = srgb_lut[src[4 * i + 2]];
            dst[4 * i + 3] = src[4 * i + 3] * (1.0f / 255.0f);
        }
    } else {
        for (int64_t i = 0; i < n_pixels * 4; ++i)
            dst[i] = src[i] * (1.0f / 255.0f);
    }
}

// Bilinear resize of f32 RGBA [src_h, src_w] -> [dst_h, dst_w], sampling at
// destination pixel centers with clamp-to-edge — exactly the
// vkCmdBlitImage(VK_FILTER_LINEAR) rule the reference's mip chain uses.
void blit_resize_bilinear(const float* src, int src_w, int src_h,
                          float* dst, int dst_w, int dst_h) {
    const double sx = (double)src_w / dst_w;
    const double sy = (double)src_h / dst_h;
    for (int y = 0; y < dst_h; ++y) {
        const double fy = (y + 0.5) * sy - 0.5;
        int y0 = (int)std::floor(fy);
        const float wy = (float)(fy - y0);
        const int y0c = std::clamp(y0, 0, src_h - 1);
        const int y1c = std::clamp(y0 + 1, 0, src_h - 1);
        const float* row0 = src + (int64_t)y0c * src_w * 4;
        const float* row1 = src + (int64_t)y1c * src_w * 4;
        float* out = dst + (int64_t)y * dst_w * 4;
        for (int x = 0; x < dst_w; ++x) {
            const double fx = (x + 0.5) * sx - 0.5;
            int x0 = (int)std::floor(fx);
            const float wx = (float)(fx - x0);
            const int x0c = std::clamp(x0, 0, src_w - 1);
            const int x1c = std::clamp(x0 + 1, 0, src_w - 1);
            const float* a = row0 + x0c * 4;
            const float* b = row0 + x1c * 4;
            const float* c = row1 + x0c * 4;
            const float* d = row1 + x1c * 4;
            for (int k = 0; k < 4; ++k) {
                const float top = a[k] + (b[k] - a[k]) * wx;
                const float bot = c[k] + (d[k] - c[k]) * wx;
                out[x * 4 + k] = top + (bot - top) * wy;
            }
        }
    }
}

// Full mip chain generation into a caller-provided packed buffer.
// Level sizes follow mipLevels = floor(log2(max(w,h)))+1 (vk_loader.cpp:121);
// each level resamples the PREVIOUS level (the blit chain semantics).
// Returns number of levels written.  `out` must hold sum of level texel
// counts * 4 floats; `offsets` receives per-level texel offsets.
int generate_mips(const float* level0, int w, int h, float* out,
                  int64_t* offsets, int max_levels) {
    int n_levels = (int)std::floor(std::log2((double)std::max(w, h))) + 1;
    if (n_levels > max_levels) n_levels = max_levels;
    int64_t cursor = 0;
    offsets[0] = 0;
    std::memcpy(out, level0, (int64_t)w * h * 4 * sizeof(float));
    cursor += (int64_t)w * h;
    int pw = w, ph = h;
    const float* prev = out;
    for (int m = 1; m < n_levels; ++m) {
        int nw = std::max(pw / 2, 1);
        int nh = std::max(ph / 2, 1);
        float* dst = out + cursor * 4;
        blit_resize_bilinear(prev, pw, ph, dst, nw, nh);
        offsets[m] = cursor;
        prev = dst;
        cursor += (int64_t)nw * nh;
        pw = nw; ph = nh;
    }
    return n_levels;
}

}  // extern "C"
