// Native data-IO kernels for the mdcnet_tpu host-side pipeline.
//
// The TPU compute path is jax/XLA/pallas; this is the C++ tier for the
// CPU-side work around it (SURVEY §2 "native components" row): batched
// synthetic-defect rendering (data/synthetic.py's hot loop) and uint8
// bilinear resize for real-image ingestion.  Exposed as a plain C ABI and
// bound via ctypes (mdcnet_tpu/native/__init__.py); builds with
//   g++ -O3 -march=native -shared -fPIC dataio.cc -o libmdcdataio.so
//
// The renderer reproduces the same *visual statistics* as the numpy
// implementation (steel-gray textured background, rolling bands, class
// stripe patterns) but uses its own xorshift noise — outputs are not
// bit-identical to numpy's PCG64 (documented; the python path remains the
// deterministic reference and tests pin the native path's statistics).
#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

namespace {

struct XorShift {
  uint64_t s;
  explicit XorShift(uint64_t seed) : s(seed * 2685821657736338717ULL + 1) {}
  inline uint64_t next() {
    s ^= s << 13; s ^= s >> 7; s ^= s << 17; return s;
  }
  inline float uniform() {  // [0, 1)
    return (next() >> 40) * (1.0f / (1 << 24));
  }
  inline float normal(float mu, float sigma) {
    // sum of 4 uniforms (Irwin-Hall) — cheap, close enough for texture
    float u = uniform() + uniform() + uniform() + uniform();
    return mu + sigma * (u - 2.0f) * 1.732050808f;
  }
};

const float kClassColors[10][3] = {
    {220, 60, 60},  {60, 220, 60},  {60, 60, 220},  {220, 220, 60},
    {220, 60, 220}, {60, 220, 220}, {240, 140, 40}, {140, 40, 240},
    {40, 240, 140}, {240, 240, 240}};

}  // namespace

extern "C" {

// Render `count` defect images into out (count, size, size, 3) uint8.
// labels: class indices 0..9; boxes: (count, 4) xyxy in image space;
// seeds: one uint64 per image.
void mdc_render_defects(const int32_t* labels, const float* boxes,
                        const uint64_t* seeds, int32_t count, int32_t size,
                        uint8_t* out) {
  const int64_t img_px = int64_t(size) * size;
  for (int32_t n = 0; n < count; ++n) {
    XorShift rng(seeds[n]);
    uint8_t* img = out + n * img_px * 3;
    // steel background: per-pixel gray + horizontal rolling bands
    for (int32_t y = 0; y < size; ++y) {
      const float band = 8.0f * std::sin(float(y) / 7.0f);
      uint8_t* row = img + int64_t(y) * size * 3;
      for (int32_t x = 0; x < size; ++x) {
        float v = rng.normal(128.0f, 12.0f) + band;
        uint8_t g = (uint8_t)std::clamp(v, 0.0f, 255.0f);
        row[3 * x] = g; row[3 * x + 1] = g; row[3 * x + 2] = g;
      }
    }
    // class-colored striped patch inside the box
    const int cls = labels[n];
    const float* col = kClassColors[cls];
    const float* b = boxes + n * 4;
    int x0 = (int)std::lround(b[0]), y0 = (int)std::lround(b[1]);
    int x1 = (int)std::lround(b[2]), y1 = (int)std::lround(b[3]);
    x0 = std::clamp(x0, 0, size); y0 = std::clamp(y0, 0, size);
    x1 = std::clamp(std::max(x1, x0 + 1), 0, size);
    y1 = std::clamp(std::max(y1, y0 + 1), 0, size);
    const float freq = 0.25f + 0.15f * (cls % 5);
    for (int y = y0; y < y1; ++y) {
      uint8_t* row = img + int64_t(y) * size * 3;
      for (int x = x0; x < x1; ++x) {
        const float t = (cls % 2 == 0) ? float(x - x0) : float(y - y0);
        const float stripe = 0.75f + 0.25f * std::sin(t * freq);
        for (int c = 0; c < 3; ++c) {
          float v = col[c] * stripe + rng.normal(0.0f, 6.0f);
          row[3 * x + c] = (uint8_t)std::clamp(v, 0.0f, 255.0f);
        }
      }
    }
  }
}

// Bilinear resize uint8 HWC images: in (h, w, 3) -> out (oh, ow, 3),
// align_corners=False coordinate convention (matches cv2/PIL defaults
// used by the reference's albumentations Resize).
void mdc_resize_bilinear(const uint8_t* in, int32_t h, int32_t w,
                         uint8_t* out, int32_t oh, int32_t ow) {
  for (int32_t oy = 0; oy < oh; ++oy) {
    float sy = (oy + 0.5f) * h / oh - 0.5f;
    sy = std::clamp(sy, 0.0f, float(h - 1));
    const int32_t y0 = (int32_t)sy;
    const int32_t y1 = std::min(y0 + 1, h - 1);
    const float fy = sy - y0;
    for (int32_t ox = 0; ox < ow; ++ox) {
      float sx = (ox + 0.5f) * w / ow - 0.5f;
      sx = std::clamp(sx, 0.0f, float(w - 1));
      const int32_t x0 = (int32_t)sx;
      const int32_t x1 = std::min(x0 + 1, w - 1);
      const float fx = sx - x0;
      for (int c = 0; c < 3; ++c) {
        const float v00 = in[(int64_t(y0) * w + x0) * 3 + c];
        const float v01 = in[(int64_t(y0) * w + x1) * 3 + c];
        const float v10 = in[(int64_t(y1) * w + x0) * 3 + c];
        const float v11 = in[(int64_t(y1) * w + x1) * 3 + c];
        const float v = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
                        v10 * fy * (1 - fx) + v11 * fy * fx;
        out[(int64_t(oy) * ow + ox) * 3 + c] =
            (uint8_t)std::clamp(v + 0.5f, 0.0f, 255.0f);
      }
    }
  }
}

// Scale xyxy boxes from (src_w, src_h) space to (dst, dst) with clipping
// and a minimum side length (data/synthetic.py scale_box_to_image).
void mdc_scale_boxes(const float* in, int32_t count, float src_w,
                     float src_h, float dst, float min_side, float* out) {
  for (int32_t n = 0; n < count; ++n) {
    const float* b = in + n * 4;
    float* o = out + n * 4;
    o[0] = std::clamp(b[0] * dst / src_w, 0.0f, dst);
    o[1] = std::clamp(b[1] * dst / src_h, 0.0f, dst);
    o[2] = std::clamp(b[2] * dst / src_w, 0.0f, dst);
    o[3] = std::clamp(b[3] * dst / src_h, 0.0f, dst);
    if (o[2] - o[0] < min_side) {
      o[2] = std::min(o[0] + min_side, dst);
      o[0] = o[2] - min_side;
    }
    if (o[3] - o[1] < min_side) {
      o[3] = std::min(o[1] + min_side, dst);
      o[1] = o[3] - min_side;
    }
  }
}

}  // extern "C"
