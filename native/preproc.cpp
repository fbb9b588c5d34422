// Native host-side image preprocessing for the data pipeline.
//
// The reference's transform stack (Datasets/utils.py:49-228) makes 4+ full
// passes over every image on the Python heap (resize, crop, /255, normalize,
// layout).  This library fuses center-crop + scale + per-channel normalize +
// NHWC layout into ONE pass with std::thread parallelism, feeding the TPU
// host queue.  Exposed via a plain C ABI for ctypes (no pybind11 in the
// image).
//
// Build: make -C native   (produces libpreproc.so)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

extern "C" {

// Fused center-crop + normalize.
//
// src:  n images, uint8 HWC (BGR as cv2 loads them), size (sh, sw, 3)
// dst_raw:  n x (th, tw, 3) float32, value = pixel / 255
// dst_norm: n x (th, tw, 3) float32, value = (pixel/255 - mean[c]) / std[c]
//           (pass dst_norm = nullptr to skip)
// Crop is centered: x0 = (sw - tw) / 2, y0 = (sh - th) / 2.
void preproc_batch(const uint8_t* src, int n, int sh, int sw,
                   int th, int tw,
                   const float* mean, const float* stdv,
                   float* dst_raw, float* dst_norm,
                   int num_threads) {
  const int x0 = (sw - tw) / 2;
  const int y0 = (sh - th) / 2;
  const float inv255 = 1.0f / 255.0f;
  float inv_std[3] = {0, 0, 0};
  for (int c = 0; c < 3; c++) inv_std[c] = 1.0f / stdv[c];

  auto work = [&](int begin, int end) {
    for (int i = begin; i < end; i++) {
      const uint8_t* s = src + (size_t)i * sh * sw * 3;
      float* r = dst_raw + (size_t)i * th * tw * 3;
      float* m = dst_norm ? dst_norm + (size_t)i * th * tw * 3 : nullptr;
      for (int y = 0; y < th; y++) {
        const uint8_t* srow = s + ((size_t)(y0 + y) * sw + x0) * 3;
        float* rrow = r + (size_t)y * tw * 3;
        float* mrow = m ? m + (size_t)y * tw * 3 : nullptr;
        for (int x = 0; x < tw * 3; x += 3) {
          const float b = srow[x + 0] * inv255;
          const float g = srow[x + 1] * inv255;
          const float rr = srow[x + 2] * inv255;
          rrow[x + 0] = b;
          rrow[x + 1] = g;
          rrow[x + 2] = rr;
          if (mrow) {
            mrow[x + 0] = (b - mean[0]) * inv_std[0];
            mrow[x + 1] = (g - mean[1]) * inv_std[1];
            mrow[x + 2] = (rr - mean[2]) * inv_std[2];
          }
        }
      }
    }
  };

  int nt = std::max(1, std::min(num_threads, n));
  if (nt == 1) {
    work(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int per = (n + nt - 1) / nt;
  for (int t = 0; t < nt; t++) {
    int b = t * per, e = std::min(n, b + per);
    if (b >= e) break;
    threads.emplace_back(work, b, e);
  }
  for (auto& th_ : threads) th_.join();
}

// Bilinear resize (half-pixel centers, matching cv2.INTER_LINEAR) for the
// resize-if-small path of CropCenter (Datasets/utils.py:71-87).
void resize_bilinear_u8(const uint8_t* src, int sh, int sw,
                        uint8_t* dst, int th, int tw, int channels) {
  const float sy = (float)sh / th;
  const float sx = (float)sw / tw;
  for (int y = 0; y < th; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)fy;
    y0 = std::max(0, std::min(y0, sh - 1));
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < tw; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)fx;
      x0 = std::max(0, std::min(x0, sw - 1));
      int x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < channels; c++) {
        float top = src[(y0 * sw + x0) * channels + c] * (1 - wx)
                  + src[(y0 * sw + x1) * channels + c] * wx;
        float bot = src[(y1 * sw + x0) * channels + c] * (1 - wx)
                  + src[(y1 * sw + x1) * channels + c] * wx;
        dst[(y * tw + x) * channels + c] =
            (uint8_t)(top * (1 - wy) + bot * wy + 0.5f);
      }
    }
  }
}

}  // extern "C"
