// Host-side terrain bank generator (C++, OpenMP).
//
// Native counterpart of openballbot_rl_tpu/terrain/simplex.py and of the
// vendored oracle tools/vendored_snoise.py: the C `noise` package's snoise2
// TILED path consumed by the reference's perlin terrain
// (ballbot_gym/terrain/perlin.py:50-66 — repeatx=repeaty=1024, base=seed),
// i.e. each axis wrapped onto a circle via the library's fast-sine
// polynomial and fBm over 4D simplex noise on that torus. Outputs agree
// with the JAX implementation to float32 round-off (verified by
// tests/unit/test_native_terrain.py). Purpose: overlap terrain-bank
// regeneration with TPU training — banks for the next curriculum phase are
// produced by host cores while the chip runs the current one — and serve as
// an independent cross-check of the JAX noise.
//
// Exposed C ABI (consumed via ctypes from terrain/native.py):
//   obb_perlin_terrain(n, scale, octaves, persistence, lacunarity,
//                      amplitude, base, out[n*n])
//   obb_perlin_bank(count, seeds[count], n, ..., out[count*n*n])
//
// Build: make -C native  (produces native/libobb_terrain.so).
// NOTE: built with -ffp-contract=off so float arithmetic matches the
// NumPy/JAX op-by-op rounding (no FMA contraction).

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

inline int perm(int i) { return kPerm[i & 255]; }

// 32 4D gradients (hash & 0x1f), canonical Gustavson set.
const float kGrad4[32][4] = {
    {0, 1, 1, 1},   {0, 1, 1, -1},   {0, 1, -1, 1},   {0, 1, -1, -1},
    {0, -1, 1, 1},  {0, -1, 1, -1},  {0, -1, -1, 1},  {0, -1, -1, -1},
    {1, 0, 1, 1},   {1, 0, 1, -1},   {1, 0, -1, 1},   {1, 0, -1, -1},
    {-1, 0, 1, 1},  {-1, 0, 1, -1},  {-1, 0, -1, 1},  {-1, 0, -1, -1},
    {1, 1, 0, 1},   {1, 1, 0, -1},   {1, -1, 0, 1},   {1, -1, 0, -1},
    {-1, 1, 0, 1},  {-1, 1, 0, -1},  {-1, -1, 0, 1},  {-1, -1, 0, -1},
    {1, 1, 1, 0},   {1, 1, -1, 0},   {1, -1, 1, 0},   {1, -1, -1, 0},
    {-1, 1, 1, 0},  {-1, 1, -1, 0},  {-1, -1, 1, 0},  {-1, -1, -1, 0}};

// Simplex corner traversal order by 6-bit comparison code.
const int kSimplex[64][4] = {
    {0, 1, 2, 3}, {0, 1, 3, 2}, {0, 0, 0, 0}, {0, 2, 3, 1},
    {0, 0, 0, 0}, {0, 0, 0, 0}, {0, 0, 0, 0}, {1, 2, 3, 0},
    {0, 2, 1, 3}, {0, 0, 0, 0}, {0, 3, 1, 2}, {0, 3, 2, 1},
    {0, 0, 0, 0}, {0, 0, 0, 0}, {0, 0, 0, 0}, {1, 3, 2, 0},
    {0, 0, 0, 0}, {0, 0, 0, 0}, {0, 0, 0, 0}, {0, 0, 0, 0},
    {0, 0, 0, 0}, {0, 0, 0, 0}, {0, 0, 0, 0}, {0, 0, 0, 0},
    {1, 2, 0, 3}, {0, 0, 0, 0}, {1, 3, 0, 2}, {0, 0, 0, 0},
    {0, 0, 0, 0}, {0, 0, 0, 0}, {2, 3, 0, 1}, {2, 3, 1, 0},
    {1, 0, 2, 3}, {1, 0, 3, 2}, {0, 0, 0, 0}, {0, 0, 0, 0},
    {0, 0, 0, 0}, {2, 0, 3, 1}, {0, 0, 0, 0}, {2, 1, 3, 0},
    {0, 0, 0, 0}, {0, 0, 0, 0}, {0, 0, 0, 0}, {0, 0, 0, 0},
    {0, 0, 0, 0}, {0, 0, 0, 0}, {0, 0, 0, 0}, {0, 0, 0, 0},
    {2, 0, 1, 3}, {0, 0, 0, 0}, {0, 0, 0, 0}, {0, 0, 0, 0},
    {3, 0, 1, 2}, {3, 0, 2, 1}, {0, 0, 0, 0}, {3, 1, 2, 0},
    {2, 1, 0, 3}, {0, 0, 0, 0}, {0, 0, 0, 0}, {0, 0, 0, 0},
    {3, 1, 0, 2}, {0, 0, 0, 0}, {3, 2, 0, 1}, {3, 2, 1, 0}};

const float kF4 = 0.30901699437494745f;  // (sqrt(5) - 1) / 4
const float kG4 = 0.1381966011250105f;   // (5 - sqrt(5)) / 20
const double kM1Pi = 0.31830988618379067154;
const double kMPi2 = 1.57079632679489661923;

// The C noise library's parabola sine (float32, period 2*pi).
inline float fast_sin(float xin) {
  float x = static_cast<float>(static_cast<double>(xin) * kM1Pi);
  volatile float z = x + 25165824.0f;  // wrap into [-1, 1] (units of pi)
  x = x - (z - 25165824.0f);
  const float y = x - x * std::fabs(x);
  return y * (3.1f + 3.6f * std::fabs(y));
}

inline float fast_cos(float x) {
  return fast_sin(static_cast<float>(static_cast<double>(x) + kMPi2));
}

float noise4(float x, float y, float z, float w) {
  const float s = (x + y + z + w) * kF4;
  const float fi = std::floor(x + s);
  const float fj = std::floor(y + s);
  const float fk = std::floor(z + s);
  const float fl = std::floor(w + s);
  const float t = (((fi + fj) + fk) + fl) * kG4;

  const float x0 = x - (fi - t);
  const float y0 = y - (fj - t);
  const float z0 = z - (fk - t);
  const float w0 = w - (fl - t);

  const int c = (x0 > y0 ? 32 : 0) + (x0 > z0 ? 16 : 0) + (y0 > z0 ? 8 : 0) +
                (x0 > w0 ? 4 : 0) + (y0 > w0 ? 2 : 0) + (z0 > w0 ? 1 : 0);
  const int* rank = kSimplex[c];
  int off[5][4];
  for (int d = 0; d < 4; ++d) {
    off[0][d] = 0;
    off[1][d] = rank[d] >= 3 ? 1 : 0;
    off[2][d] = rank[d] >= 2 ? 1 : 0;
    off[3][d] = rank[d] >= 1 ? 1 : 0;
    off[4][d] = 1;
  }

  const int ii = static_cast<int>(fi) & 255;
  const int jj = static_cast<int>(fj) & 255;
  const int kk = static_cast<int>(fk) & 255;
  const int ll = static_cast<int>(fl) & 255;

  float total = 0.0f;
  for (int m = 0; m < 5; ++m) {
    const float gm = static_cast<float>(m) * kG4;
    const float xc = x0 - static_cast<float>(off[m][0]) + gm;
    const float yc = y0 - static_cast<float>(off[m][1]) + gm;
    const float zc = z0 - static_cast<float>(off[m][2]) + gm;
    const float wc = w0 - static_cast<float>(off[m][3]) + gm;
    const float f = 0.6f - xc * xc - yc * yc - zc * zc - wc * wc;
    if (f > 0.0f) {
      const int gi =
          perm(ii + off[m][0] +
               perm(jj + off[m][1] +
                    perm(kk + off[m][2] + perm(ll + off[m][3])))) & 0x1f;
      const float* g = kGrad4[gi];
      const float grad = g[0] * xc + g[1] * yc + g[2] * zc + g[3] * wc;
      const float f2 = f * f;
      total += f2 * f2 * grad;
    }
  }
  return total * 27.0f;
}

float fbm_noise4(float x, float y, float z, float w, int octaves,
                 float persistence, float lacunarity) {
  float freq = 1.0f;
  float amp = 1.0f;
  float maxv = 1.0f;
  float total = noise4(x, y, z, w);
  for (int k = 1; k < octaves; ++k) {
    freq *= lacunarity;
    amp *= persistence;
    maxv += amp;
    total += noise4(x * freq, y * freq, z * freq, w * freq) * amp;
  }
  return total / maxv;
}

inline float clip01(float v) {
  return v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
}

// One terrain row i: the tiled-path torus embedding (snoise2 with both
// repeats = 1024) followed by fbm over noise4. `base` is the terrain seed.
void perlin_row(int i, int n, float scale, int octaves, float persistence,
                float lacunarity, float amplitude, float base, float* dst) {
  const float repeat = 1024.0f;
  const float xr = static_cast<float>(static_cast<double>(repeat) * kM1Pi * 0.5);
  const float xcoord =
      static_cast<float>(static_cast<double>(i) / static_cast<double>(scale));
  const float xf =
      static_cast<float>(static_cast<double>(xcoord) * 2.0 /
                         static_cast<double>(repeat));
  const float xt = fast_sin(xf) * xr;
  const float zc = base + fast_cos(xf) * xr;
  for (int j = 0; j < n; ++j) {
    const float ycoord =
        static_cast<float>(static_cast<double>(j) / static_cast<double>(scale));
    const float yf =
        static_cast<float>(static_cast<double>(ycoord) * 2.0 /
                           static_cast<double>(repeat));
    const float yt = fast_sin(yf) * xr;
    const float wc = base + fast_cos(yf) * xr;
    const float noise =
        fbm_noise4(xt, yt, zc, wc, octaves, persistence, lacunarity);
    // post-map in double like the reference (perlin.py:67-71)
    const double norm = (static_cast<double>(noise) + 1.0) / 2.0 *
                        static_cast<double>(amplitude);
    dst[static_cast<long>(i) * n + j] =
        clip01(static_cast<float>(norm));
  }
}

}  // namespace

extern "C" {

void obb_perlin_terrain(int n, float scale, int octaves, float persistence,
                        float lacunarity, float amplitude, int base,
                        float* out) {
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    perlin_row(i, n, scale, octaves, persistence, lacunarity, amplitude,
               static_cast<float>(base), out);
  }
}

void obb_perlin_bank(int count, const int* seeds, int n, float scale,
                     int octaves, float persistence, float lacunarity,
                     float amplitude, float* out) {
#pragma omp parallel for schedule(dynamic)
  for (int k = 0; k < count; ++k) {
    float* dst = out + static_cast<long>(k) * n * n;
    for (int i = 0; i < n; ++i) {
      perlin_row(i, n, scale, octaves, persistence, lacunarity, amplitude,
                 static_cast<float>(seeds[k]), dst);
    }
  }
}

}  // extern "C"
