// Native host-side image ops for the data-loader hot path.
//
// The reference's host pipeline leans on OpenCV's C++ under Python
// (Process.py cv2 calls, Utils.py PIL transforms); this library plays that
// role for the TPU framework's loader: batched shorter-side resize +
// center-crop of uint8 HWC images, parallelized across a thread pool. The
// Python side binds via ctypes (utils/native.py) and falls back to PIL when
// the library is not built.
//
// Resampling is separable antialiased bilinear (triangle filter whose
// support scales with the downscale ratio, half-pixel centers) — the same
// algorithm PIL/torchvision use for Image.BILINEAR, so eval-pipeline
// geometry and values match the reference (train.py:137-142) to rounding.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct ResampleWeights {
  int ksize = 0;                 // taps per output element
  std::vector<int> bounds;       // start index per output element
  std::vector<float> weights;    // ksize weights per output element
};

// Triangle (bilinear) filter weights with support scaled for downscale —
// PIL's precompute_coeffs algorithm expressed in float.
ResampleWeights precompute(int in_size, int out_size) {
  ResampleWeights rw;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = filterscale;  // triangle filter support = 1.0
  rw.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  rw.bounds.resize(out_size);
  rw.weights.assign(static_cast<size_t>(out_size) * rw.ksize, 0.0f);

  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    const int n = xmax - xmin;

    double sum = 0.0;
    std::vector<double> w(n);
    for (int x = 0; x < n; ++x) {
      const double d = (x + xmin - center + 0.5) / filterscale;
      const double t = d < 0 ? -d : d;
      w[x] = t >= 1.0 ? 0.0 : 1.0 - t;
      sum += w[x];
    }
    rw.bounds[xx] = xmin;
    if (sum > 0) {
      for (int x = 0; x < n; ++x) {
        rw.weights[static_cast<size_t>(xx) * rw.ksize + x] =
            static_cast<float>(w[x] / sum);
      }
    }
  }
  return rw;
}

// Separable two-pass resample of only the WINDOW [oy0, oy0+wh) x
// [ox0, ox0+ww) of the virtual (out_h, out_w) resize of src. Fusing the
// downstream center-crop into the resample this way skips the ~25-40% of
// output pixels (and their input rows) the crop would discard — the edge
// the native path holds over PIL's full-frame resample on the loader host.
// dst is (wh, ww, 3) u8.
void resize_bilinear_aa_window(const uint8_t* src, int in_h, int in_w,
                               uint8_t* dst, int out_h, int out_w, int oy0,
                               int ox0, int wh, int ww) {
  const ResampleWeights wx = precompute(in_w, out_w);
  const ResampleWeights wy = precompute(in_h, out_h);

  // input rows feeding the window's vertical supports
  int ymin = wy.bounds[oy0];
  int ymax = std::min(wy.bounds[oy0 + wh - 1] + wy.ksize, in_h);

  // horizontal pass: rows [ymin, ymax) x window columns, float intermediate
  std::vector<float> tmp(static_cast<size_t>(ymax - ymin) * ww * 3);
  for (int y = ymin; y < ymax; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * in_w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y - ymin) * ww * 3;
    for (int ox = 0; ox < ww; ++ox) {
      const int x0 = wx.bounds[ox0 + ox];
      const float* w = &wx.weights[static_cast<size_t>(ox0 + ox) * wx.ksize];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int k = 0; k < wx.ksize; ++k) {
        const float wk = w[k];
        if (wk == 0.0f) continue;
        const uint8_t* p = row + (static_cast<size_t>(x0) + k) * 3;
        acc0 += wk * p[0];
        acc1 += wk * p[1];
        acc2 += wk * p[2];
      }
      trow[ox * 3 + 0] = acc0;
      trow[ox * 3 + 1] = acc1;
      trow[ox * 3 + 2] = acc2;
    }
  }

  // vertical pass: window rows, round once
  for (int oy = 0; oy < wh; ++oy) {
    const int y0 = wy.bounds[oy0 + oy] - ymin;
    const float* w = &wy.weights[static_cast<size_t>(oy0 + oy) * wy.ksize];
    uint8_t* drow = dst + static_cast<size_t>(oy) * ww * 3;
    for (int ox = 0; ox < ww; ++ox) {
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int k = 0; k < wy.ksize; ++k) {
        const float wk = w[k];
        if (wk == 0.0f) continue;
        const float* p =
            tmp.data() + ((static_cast<size_t>(y0) + k) * ww + ox) * 3;
        acc0 += wk * p[0];
        acc1 += wk * p[1];
        acc2 += wk * p[2];
      }
      drow[ox * 3 + 0] =
          static_cast<uint8_t>(std::clamp(std::lround(acc0), 0L, 255L));
      drow[ox * 3 + 1] =
          static_cast<uint8_t>(std::clamp(std::lround(acc1), 0L, 255L));
      drow[ox * 3 + 2] =
          static_cast<uint8_t>(std::clamp(std::lround(acc2), 0L, 255L));
    }
  }
}

// Full-frame resize (h, w, 3) u8 -> (out_h, out_w, 3) u8.
void resize_bilinear_aa(const uint8_t* src, int in_h, int in_w, uint8_t* dst,
                        int out_h, int out_w) {
  resize_bilinear_aa_window(src, in_h, in_w, dst, out_h, out_w, 0, 0, out_h,
                            out_w);
}

void run_parallel(int n, int max_threads, const std::function<void(int)>& fn) {
  const int n_threads =
      std::max(1, std::min<int>({max_threads, n,
                                 static_cast<int>(
                                     std::thread::hardware_concurrency())}));
  if (n_threads == 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : workers) th.join();
}

}  // namespace

extern "C" {

// Shorter-side resize to `resize`, then center-crop `crop` x `crop`.
// src: (h, w, 3) uint8; dst: (crop, crop, 3) uint8.
void apvt_resize_center_crop(const uint8_t* src, int h, int w, int resize,
                             int crop, uint8_t* dst) {
  // Long-side TRUNCATION (torchvision _compute_resized_output_size:
  // new_long = int(size * long / short)); crop offsets below use
  // round-half-to-even, matching torchvision CenterCrop's Python round().
  int new_w, new_h;
  if (w <= h) {
    new_w = resize;
    new_h = std::max(1, static_cast<int>(static_cast<double>(h) * resize / w));
  } else {
    new_h = resize;
    new_w = std::max(1, static_cast<int>(static_cast<double>(w) * resize / h));
  }
  const int left = std::clamp(
      static_cast<int>(std::nearbyint((new_w - crop) / 2.0)), 0,
      std::max(new_w - crop, 0));
  const int top = static_cast<int>(std::nearbyint((new_h - crop) / 2.0));
  // unique (unclamped) output-row range; rows outside [0, new_h) replicate
  // the nearest edge row, matching the pre-fusion crop semantics
  const int ry0 = std::clamp(top, 0, new_h - 1);
  const int ry1 = std::clamp(top + crop - 1, 0, new_h - 1);
  const int ww = std::min(crop, new_w);

  if (new_w == w && new_h == h) {
    // identity resize (image already at target geometry): crop directly
    for (int y = 0; y < crop; ++y) {
      const int sy = std::clamp(top + y, 0, new_h - 1);
      std::memcpy(dst + static_cast<size_t>(y) * crop * 3,
                  src + (static_cast<size_t>(sy) * new_w + left) * 3,
                  static_cast<size_t>(ww) * 3);
    }
    return;
  }

  // crop fused into the resample: only the surviving window is computed
  if (ry1 - ry0 + 1 == crop && ww == crop) {  // common case: no edge clamping
    resize_bilinear_aa_window(src, h, w, dst, new_h, new_w, ry0, left, crop,
                              crop);
    return;
  }
  std::vector<uint8_t> win(static_cast<size_t>(ry1 - ry0 + 1) * ww * 3);
  resize_bilinear_aa_window(src, h, w, win.data(), new_h, new_w, ry0, left,
                            ry1 - ry0 + 1, ww);
  for (int y = 0; y < crop; ++y) {
    const int sy = std::clamp(top + y, 0, new_h - 1) - ry0;
    std::memcpy(dst + static_cast<size_t>(y) * crop * 3,
                win.data() + static_cast<size_t>(sy) * ww * 3,
                static_cast<size_t>(ww) * 3);
  }
}

// Batched variant over `n` same-shape images, parallel across a pool.
void apvt_batch_resize_center_crop(const uint8_t* src, int n, int h, int w,
                                   int resize, int crop, uint8_t* dst,
                                   int max_threads) {
  const size_t in_stride = static_cast<size_t>(h) * w * 3;
  const size_t out_stride = static_cast<size_t>(crop) * crop * 3;
  run_parallel(n, max_threads, [&](int i) {
    apvt_resize_center_crop(src + i * in_stride, h, w, resize, crop,
                            dst + i * out_stride);
  });
}

// Aspect-preserving resize + centered zero padding (the ETL's pad-resize,
// reference Process.py:13-26). src (h, w, 3) -> dst (size, size, 3).
void apvt_resize_with_padding(const uint8_t* src, int h, int w, int size,
                              uint8_t* dst) {
  const double scale =
      std::min(static_cast<double>(size) / w, static_cast<double>(size) / h);
  const int new_w = std::max(1, static_cast<int>(w * scale));
  const int new_h = std::max(1, static_cast<int>(h * scale));
  std::vector<uint8_t> tmp(static_cast<size_t>(new_h) * new_w * 3);
  resize_bilinear_aa(src, h, w, tmp.data(), new_h, new_w);

  std::memset(dst, 0, static_cast<size_t>(size) * size * 3);
  const int top = (size - new_h) / 2;
  const int left = (size - new_w) / 2;
  for (int y = 0; y < new_h; ++y) {
    std::memcpy(dst + ((static_cast<size_t>(top + y)) * size + left) * 3,
                tmp.data() + static_cast<size_t>(y) * new_w * 3,
                static_cast<size_t>(new_w) * 3);
  }
}

// uint8 HWC batch -> float32 normalized NHWC: (x/255 - mean) / std.
void apvt_batch_u8_to_f32_normalize(const uint8_t* src, int n, int h, int w,
                                    const float* mean, const float* stddev,
                                    float* dst, int max_threads) {
  const size_t stride = static_cast<size_t>(h) * w * 3;
  float inv[3], off[3];
  for (int ch = 0; ch < 3; ++ch) {
    inv[ch] = 1.0f / (255.0f * stddev[ch]);
    off[ch] = mean[ch] / stddev[ch];
  }
  run_parallel(n, max_threads, [&](int i) {
    const uint8_t* s = src + i * stride;
    float* d = dst + i * stride;
    for (size_t p = 0; p < stride; p += 3) {
      d[p] = s[p] * inv[0] - off[0];
      d[p + 1] = s[p + 1] * inv[1] - off[1];
      d[p + 2] = s[p + 2] * inv[2] - off[2];
    }
  });
}

}  // extern "C"
