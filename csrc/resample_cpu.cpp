// Host-side N-D affine resampler (C ABI, ctypes-loaded).
//
// TPU-native framework's CPU data-pipeline analog of the reference's
// monai/csrc/resample/pushpull_cpu.cpp: the device path is XLA/Pallas; this kernel
// accelerates host preprocessing (dataloader workers) where numpy's gather-based
// interpolation is allocation-heavy. Supports 2D/3D, orders 0/1 (nearest/linear),
// boundary modes zeros/border/reflection, float32, multithreaded over output slabs.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread resample_cpu.cpp
//        -o libmonai_tpu_native.so

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

enum Bound { ZEROS = 0, BORDER = 1, REFLECTION = 2 };

inline float reflect_coord(float c, int n) {
  // reflect about -0.5 and n-0.5 (align_corners=false convention)
  if (n == 1) return 0.0f;
  float x = c + 0.5f;
  const float period = 2.0f * n;
  x = std::fmod(x, period);
  if (x < 0) x += period;
  if (x >= n) x = period - x;
  x -= 0.5f;
  if (x < 0.0f) x = 0.0f;
  const float hi = static_cast<float>(n - 1);
  if (x > hi) x = hi;
  return x;
}

inline float prep_coord(float c, int n, int bound) {
  if (bound == BORDER) {
    if (c < 0.0f) return 0.0f;
    const float hi = static_cast<float>(n - 1);
    return c > hi ? hi : c;
  }
  if (bound == REFLECTION) return reflect_coord(c, n);
  return c;  // zeros: handled by per-tap masking
}

struct Shape3 {
  int64_t c, d0, d1, d2;  // channels + up to 3 spatial (d0 may be 1 for 2D)
};

// trilinear / nearest sample of one point; input strides in elements
inline float sample3(const float* in, const Shape3& s, float c0, float c1, float c2, int order,
                     int bound) {
  const int64_t s2 = 1, s1 = s.d2, s0 = s.d1 * s.d2;
  if (order == 0) {
    float p0 = prep_coord(c0, (int)s.d0, bound);
    float p1 = prep_coord(c1, (int)s.d1, bound);
    float p2 = prep_coord(c2, (int)s.d2, bound);
    int64_t i0 = (int64_t)std::floor(p0 + 0.5f);
    int64_t i1 = (int64_t)std::floor(p1 + 0.5f);
    int64_t i2 = (int64_t)std::floor(p2 + 0.5f);
    if (bound == ZEROS) {
      if (i0 < 0 || i0 >= s.d0 || i1 < 0 || i1 >= s.d1 || i2 < 0 || i2 >= s.d2) return 0.0f;
    } else {
      if (i0 < 0) i0 = 0; if (i0 >= s.d0) i0 = s.d0 - 1;
      if (i1 < 0) i1 = 0; if (i1 >= s.d1) i1 = s.d1 - 1;
      if (i2 < 0) i2 = 0; if (i2 >= s.d2) i2 = s.d2 - 1;
    }
    return in[i0 * s0 + i1 * s1 + i2 * s2];
  }
  // linear
  float p0 = prep_coord(c0, (int)s.d0, bound);
  float p1 = prep_coord(c1, (int)s.d1, bound);
  float p2 = prep_coord(c2, (int)s.d2, bound);
  const float f0 = std::floor(p0), f1 = std::floor(p1), f2 = std::floor(p2);
  const float t0 = p0 - f0, t1 = p1 - f1, t2 = p2 - f2;
  const int64_t b0 = (int64_t)f0, b1 = (int64_t)f1, b2 = (int64_t)f2;
  float acc = 0.0f;
  for (int k0 = 0; k0 <= 1; ++k0)
    for (int k1 = 0; k1 <= 1; ++k1)
      for (int k2 = 0; k2 <= 1; ++k2) {
        int64_t i0 = b0 + k0, i1 = b1 + k1, i2 = b2 + k2;
        float w = (k0 ? t0 : 1.0f - t0) * (k1 ? t1 : 1.0f - t1) * (k2 ? t2 : 1.0f - t2);
        if (bound == ZEROS) {
          if (i0 < 0 || i0 >= s.d0 || i1 < 0 || i1 >= s.d1 || i2 < 0 || i2 >= s.d2) continue;
        } else {
          if (i0 < 0) i0 = 0; if (i0 >= s.d0) i0 = s.d0 - 1;
          if (i1 < 0) i1 = 0; if (i1 >= s.d1) i1 = s.d1 - 1;
          if (i2 < 0) i2 = 0; if (i2 >= s.d2) i2 = s.d2 - 1;
        }
        acc += w * in[i0 * s0 + i1 * s1 + i2 * s2];
      }
  return acc;
}

}  // namespace

extern "C" {

// Affine resample float32 channel-first input.
// in:  (C, in0, in1, in2); out: (C, out0, out1, out2) — for 2D pass d0 = 1 with an
// identity row in the matrix. matrix: row-major (4, 4) output-voxel -> input-voxel map
// over (d0, d1, d2) coordinates.
int affine_resample_f32(const float* in, float* out, const double* matrix, int64_t channels,
                        int64_t in0, int64_t in1, int64_t in2, int64_t out0, int64_t out1,
                        int64_t out2, int order, int bound, int num_threads) {
  if (order != 0 && order != 1) return -1;
  Shape3 shp{channels, in0, in1, in2};
  const int64_t in_vol = in0 * in1 * in2;
  const int64_t out_vol = out0 * out1 * out2;
  const double m00 = matrix[0], m01 = matrix[1], m02 = matrix[2], m03 = matrix[3];
  const double m10 = matrix[4], m11 = matrix[5], m12 = matrix[6], m13 = matrix[7];
  const double m20 = matrix[8], m21 = matrix[9], m22 = matrix[10], m23 = matrix[11];

  int hw = num_threads > 0 ? num_threads : (int)std::thread::hardware_concurrency();
  if (hw < 1) hw = 1;
  if (hw > out0) hw = (int)out0 > 0 ? (int)out0 : 1;

  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t x0 = lo; x0 < hi; ++x0) {
      for (int64_t x1 = 0; x1 < out1; ++x1) {
        // input coordinate of (x0, x1, 0) and per-x2 increments
        double c0 = m00 * x0 + m01 * x1 + m03;
        double c1 = m10 * x0 + m11 * x1 + m13;
        double c2 = m20 * x0 + m21 * x1 + m23;
        const int64_t out_base = x0 * out1 * out2 + x1 * out2;
        for (int64_t x2 = 0; x2 < out2; ++x2) {
          const float p0 = (float)(c0 + m02 * x2);
          const float p1 = (float)(c1 + m12 * x2);
          const float p2 = (float)(c2 + m22 * x2);
          for (int64_t ch = 0; ch < channels; ++ch) {
            out[ch * out_vol + out_base + x2] =
                sample3(in + ch * in_vol, shp, p0, p1, p2, order, bound);
          }
        }
      }
    }
  };

  if (hw == 1) {
    worker(0, out0);
  } else {
    std::vector<std::thread> threads;
    const int64_t chunk = (out0 + hw - 1) / hw;
    for (int t = 0; t < hw; ++t) {
      const int64_t lo = t * chunk;
      const int64_t hi = lo + chunk > out0 ? out0 : lo + chunk;
      if (lo >= hi) break;
      threads.emplace_back(worker, lo, hi);
    }
    for (auto& th : threads) th.join();
  }
  return 0;
}

int native_version() { return 1; }

}  // extern "C"
