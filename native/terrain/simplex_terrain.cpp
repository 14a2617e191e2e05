// Host-side terrain bank generator (C++, OpenMP).
//
// Native counterpart of openballbot_rl_tpu/terrain/simplex.py — the SAME
// Gustavson 2D simplex algorithm over the SAME Ken Perlin permutation table,
// so outputs agree with the JAX implementation to float32 roundoff (verified
// by tests/unit/test_native_terrain.py). Purpose: overlap terrain-bank
// regeneration with TPU training — banks for the next training phase are
// produced by host cores while the chip runs the current one — and serve as
// an independent cross-check of the JAX noise.
//
// Exposed C ABI (consumed via ctypes from terrain/native.py):
//   obb_perlin_terrain(n, scale, octaves, persistence, lacunarity,
//                      amplitude, base, out[n*n])
//   obb_perlin_bank(count, seeds[count], n, ..., out[count*n*n])
//
// Build: make -C native  (produces native/libobb_terrain.so)

#include <cmath>
#include <cstdint>

namespace {

const int kPerm[256] = {
    151, 160, 137, 91,  90,  15,  131, 13,  201, 95,  96,  53,  194, 233,
    7,   225, 140, 36,  103, 30,  69,  142, 8,   99,  37,  240, 21,  10,
    23,  190, 6,   148, 247, 120, 234, 75,  0,   26,  197, 62,  94,  252,
    219, 203, 117, 35,  11,  32,  57,  177, 33,  88,  237, 149, 56,  87,
    174, 20,  125, 136, 171, 168, 68,  175, 74,  165, 71,  134, 139, 48,
    27,  166, 77,  146, 158, 231, 83,  111, 229, 122, 60,  211, 133, 230,
    220, 105, 92,  41,  55,  46,  245, 40,  244, 102, 143, 54,  65,  25,
    63,  161, 1,   216, 80,  73,  209, 76,  132, 187, 208, 89,  18,  169,
    200, 196, 135, 130, 116, 188, 159, 86,  164, 100, 109, 198, 173, 186,
    3,   64,  52,  217, 226, 250, 124, 123, 5,   202, 38,  147, 118, 126,
    255, 82,  85,  212, 207, 206, 59,  227, 47,  16,  58,  17,  182, 189,
    28,  42,  223, 183, 170, 213, 119, 248, 152, 2,   44,  154, 163, 70,
    221, 153, 101, 155, 167, 43,  172, 9,   129, 22,  39,  253, 19,  98,
    108, 110, 79,  113, 224, 232, 178, 185, 112, 104, 218, 246, 97,  228,
    251, 34,  242, 193, 238, 210, 144, 12,  191, 179, 162, 241, 81,  51,
    145, 235, 249, 14,  239, 107, 49,  192, 214, 31,  181, 199, 106, 157,
    184, 84,  204, 176, 115, 121, 50,  45,  127, 4,   150, 254, 138, 236,
    205, 93,  222, 114, 67,  29,  24,  72,  243, 141, 128, 195, 78,  66,
    215, 61,  156, 180};

const float kGrad2[8][2] = {{1, 1},  {-1, 1}, {1, -1}, {-1, -1},
                            {1, 0},  {-1, 0}, {0, 1},  {0, -1}};

const float kF2 = 0.5f * (std::sqrt(3.0f) - 1.0f);
const float kG2 = (3.0f - std::sqrt(3.0f)) / 6.0f;

inline int perm(int i) { return kPerm[i & 255]; }

inline float grad_dot(int hash_val, float x, float y) {
  const float* g = kGrad2[hash_val & 7];
  return g[0] * x + g[1] * y;
}

float snoise2(float x, float y, int base) {
  const float s = (x + y) * kF2;
  const int i = static_cast<int>(std::floor(x + s));
  const int j = static_cast<int>(std::floor(y + s));
  const float t = static_cast<float>(i + j) * kG2;
  const float x0 = x - (static_cast<float>(i) - t);
  const float y0 = y - (static_cast<float>(j) - t);

  const bool upper = x0 > y0;
  const int i1 = upper ? 1 : 0;
  const int j1 = upper ? 0 : 1;

  const float x1 = x0 - static_cast<float>(i1) + kG2;
  const float y1 = y0 - static_cast<float>(j1) + kG2;
  const float x2 = x0 - 1.0f + 2.0f * kG2;
  const float y2 = y0 - 1.0f + 2.0f * kG2;

  const int ii = i & 255;
  const int jj = j & 255;
  // base reseeds by offsetting the inner permutation lookup
  // (terrain/simplex.py:85-89 semantics)
  const int gi0 = perm(ii + perm((jj + base) & 255));
  const int gi1 = perm(ii + i1 + perm((jj + j1 + base) & 255));
  const int gi2 = perm(ii + 1 + perm((jj + 1 + base) & 255));

  float n = 0.0f;
  float tt = 0.5f - x0 * x0 - y0 * y0;
  if (tt > 0.0f) {
    const float t4 = tt * tt * tt * tt;
    n += t4 * grad_dot(gi0, x0, y0);
  }
  tt = 0.5f - x1 * x1 - y1 * y1;
  if (tt > 0.0f) {
    const float t4 = tt * tt * tt * tt;
    n += t4 * grad_dot(gi1, x1, y1);
  }
  tt = 0.5f - x2 * x2 - y2 * y2;
  if (tt > 0.0f) {
    const float t4 = tt * tt * tt * tt;
    n += t4 * grad_dot(gi2, x2, y2);
  }
  return 70.0f * n;
}

float fbm2(float x, float y, int octaves, float persistence, float lacunarity,
           int base) {
  float total = 0.0f;
  float freq = 1.0f;
  float amp = 1.0f;
  float max_amp = 0.0f;
  for (int k = 0; k < octaves; ++k) {
    total += snoise2(x * freq, y * freq, base) * amp;
    max_amp += amp;
    freq *= lacunarity;
    amp *= persistence;
  }
  return total / max_amp;
}

inline float clip01(float v) {
  return v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
}

}  // namespace

extern "C" {

void obb_perlin_terrain(int n, float scale, int octaves, float persistence,
                        float lacunarity, float amplitude, int base,
                        float* out) {
  // grid semantics match generators.generate_perlin_terrain: coord = idx/scale
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    const float x = static_cast<float>(i) / scale;
    for (int j = 0; j < n; ++j) {
      const float y = static_cast<float>(j) / scale;
      const float noise =
          fbm2(x, y, octaves, persistence, lacunarity, base);
      out[static_cast<long>(i) * n + j] =
          clip01((noise + 1.0f) / 2.0f * amplitude);
    }
  }
}

void obb_perlin_bank(int count, const int* seeds, int n, float scale,
                     int octaves, float persistence, float lacunarity,
                     float amplitude, float* out) {
#pragma omp parallel for schedule(dynamic)
  for (int k = 0; k < count; ++k) {
    // serial inner generation per terrain; parallelism over the bank
    const int base = seeds[k];
    float* dst = out + static_cast<long>(k) * n * n;
    for (int i = 0; i < n; ++i) {
      const float x = static_cast<float>(i) / scale;
      for (int j = 0; j < n; ++j) {
        const float y = static_cast<float>(j) / scale;
        const float noise =
            fbm2(x, y, octaves, persistence, lacunarity, base);
        dst[static_cast<long>(i) * n + j] =
            clip01((noise + 1.0f) / 2.0f * amplitude);
      }
    }
  }
}

}  // extern "C"
