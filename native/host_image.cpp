// Native host-side image runtime for the birefnet_tpu data loader.
//
// TPU-native counterpart of the reference's host image path, which does
// per-pixel Rust loops single-threaded (triangle resize + normalize:
// reference examples/infer_image.rs:44-67; Lanczos3 mask resize:
// examples/infer_image.rs:103-108). Here the host side is an OpenMP-parallel
// C++ library used by the serving data loader to batch variable-size frames
// into fixed-size uint8 tensors before device ingest; normalization and the
// model-side resizes stay on the TPU (see pipeline.py).
//
// Resampling semantics match the `image` crate's filters: separable
// convolution with half-pixel centers and antialias scaling on downsample
// (Triangle = linear, Lanczos3 = windowed sinc, a=3).
//
// Build: make -C native    (produces libbirefnet_host.so)
// ABI: plain C, consumed via ctypes (birefnet_tpu/utils/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct WeightTable {
  // For each output index: [start, len] into src plus normalized weights.
  std::vector<int> start;
  std::vector<int> len;
  std::vector<float> weights;  // flattened, max_taps per row
  int max_taps = 0;
};

inline float triangle(float t) {
  t = std::fabs(t);
  return t < 1.0f ? 1.0f - t : 0.0f;
}

inline float lanczos3(float t) {
  t = std::fabs(t);
  if (t < 1e-8f) return 1.0f;
  if (t >= 3.0f) return 0.0f;
  const float pt = static_cast<float>(M_PI) * t;
  return 3.0f * std::sin(pt) * std::sin(pt / 3.0f) / (pt * pt);
}

WeightTable build_table(int src, int dst, float support_base,
                        float (*filter)(float)) {
  WeightTable tb;
  const float scale = static_cast<float>(src) / dst;
  const float filter_scale = std::max(scale, 1.0f);  // antialias on downscale
  const float support = support_base * filter_scale;
  tb.max_taps = static_cast<int>(std::ceil(support)) * 2 + 2;
  tb.start.resize(dst);
  tb.len.resize(dst);
  tb.weights.assign(static_cast<size_t>(dst) * tb.max_taps, 0.0f);
  for (int i = 0; i < dst; ++i) {
    const float center = (i + 0.5f) * scale - 0.5f;
    int lo = std::max(0, static_cast<int>(std::floor(center - support)));
    int hi = std::min(src - 1, static_cast<int>(std::ceil(center + support)));
    float sum = 0.0f;
    for (int j = lo; j <= hi; ++j)
      sum += filter((j - center) / filter_scale);
    tb.start[i] = lo;
    tb.len[i] = hi - lo + 1;
    float* w = &tb.weights[static_cast<size_t>(i) * tb.max_taps];
    for (int j = lo; j <= hi; ++j) {
      float v = filter((j - center) / filter_scale);
      w[j - lo] = (sum != 0.0f) ? v / sum : (j == lo ? 1.0f : 0.0f);
    }
  }
  return tb;
}

// Separable resample u8 -> u8 through f32 accumulation (per image).
void resample_u8(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                 int dw, int ch, float support, float (*filter)(float)) {
  WeightTable th = build_table(sh, dh, support, filter);
  WeightTable tw = build_table(sw, dw, support, filter);

  // Pass 1: horizontal (sw -> dw), keep rows: [sh, dw, ch] f32.
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * ch);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * sw * ch;
    float* out = &tmp[static_cast<size_t>(y) * dw * ch];
    for (int x = 0; x < dw; ++x) {
      const float* w = &tw.weights[static_cast<size_t>(x) * tw.max_taps];
      const int s0 = tw.start[x], n = tw.len[x];
      for (int c = 0; c < ch; ++c) {
        float acc = 0.0f;
        for (int j = 0; j < n; ++j)
          acc += w[j] * row[(s0 + j) * ch + c];
        out[x * ch + c] = acc;
      }
    }
  }

  // Pass 2: vertical (sh -> dh): [dh, dw, ch] u8.
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    const float* w = &th.weights[static_cast<size_t>(y) * th.max_taps];
    const int s0 = th.start[y], n = th.len[y];
    uint8_t* out = dst + static_cast<size_t>(y) * dw * ch;
    for (int x = 0; x < dw; ++x) {
      for (int c = 0; c < ch; ++c) {
        float acc = 0.0f;
        for (int j = 0; j < n; ++j)
          acc += w[j] * tmp[(static_cast<size_t>(s0 + j) * dw + x) * ch + c];
        out[x * ch + c] =
            static_cast<uint8_t>(std::clamp(std::lround(acc), 0L, 255L));
      }
    }
  }
}

}  // namespace

extern "C" {

// Triangle (bilinear, antialiased) resize, NHWC uint8.
void birefnet_resize_triangle_u8(const uint8_t* src, int sh, int sw,
                                 uint8_t* dst, int dh, int dw, int ch) {
  resample_u8(src, sh, sw, dst, dh, dw, ch, 1.0f, triangle);
}

// Lanczos3 resize, NHWC uint8.
void birefnet_resize_lanczos3_u8(const uint8_t* src, int sh, int sw,
                                 uint8_t* dst, int dh, int dw, int ch) {
  resample_u8(src, sh, sw, dst, dh, dw, ch, 3.0f, lanczos3);
}

// Batched loader op: resize a batch of same-size frames (parallel over batch).
void birefnet_batch_resize_triangle_u8(const uint8_t* src, int batch, int sh,
                                       int sw, uint8_t* dst, int dh, int dw,
                                       int ch) {
#pragma omp parallel for schedule(dynamic)
  for (int b = 0; b < batch; ++b) {
    resample_u8(src + static_cast<size_t>(b) * sh * sw * ch, sh, sw,
                dst + static_cast<size_t>(b) * dh * dw * ch, dh, dw, ch, 1.0f,
                triangle);
  }
}

// ImageNet normalize: u8 NHWC -> f32 NHWC (host fallback path; the TPU
// pipeline normally does this on device).
void birefnet_normalize_imagenet(const uint8_t* src, int n, float* dst) {
  static const float mean[3] = {0.485f, 0.456f, 0.406f};
  static const float stdv[3] = {0.229f, 0.224f, 0.225f};
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    const int c = i % 3;
    dst[i] = (src[i] / 255.0f - mean[c]) / stdv[c];
  }
}

}  // extern "C"
