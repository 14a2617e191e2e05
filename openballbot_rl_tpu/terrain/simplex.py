"""Simplex noise matching the C `noise` package's snoise2 — in JAX.

The reference's perlin terrain (ballbot_gym/terrain/perlin.py:50-66) calls
`snoise2(x, y, octaves, persistence, lacunarity, repeatx=1024, repeaty=1024,
base=seed)` from caseman/noise; its gradient terrain's perlin mode
(gradient.py:74-80) calls it with no repeats. Those are two different code
paths in the C extension:

* no repeats  -> fBm over 2D simplex noise (`noise2`, 12-gradient GRAD3
  hash), with `base` ADDED TO THE COORDINATES per octave;
* both repeats -> each axis wrapped onto a circle of radius repeat/(2*pi)
  (via the library's fast-sine polynomial) and fBm over **4D simplex noise**
  (`noise4`) on that torus; `base` seeds the two circle-normal coordinates.
  Side effects worth knowing: effective spatial frequency is divided by ~pi
  (so scale=25 means features of ~25*pi cells) and values follow the 4D
  (radius-0.6, x27) distribution — notably smoother and lower-amplitude than
  plain 2D simplex. Round 1 of this repo shipped plain 2D fBm here; that
  terrain was ~2.1x higher amplitude and ~8x rougher than the reference's
  actual training distribution (see docs/design/parity.md).

Element-wise parity contract: tools/vendored_snoise.py is the NumPy oracle
for the C extension (float32 op order mirrored); this module must match it
to float32 round-off (tests/integration/test_reference_terrain_parity.py,
tests/golden). The torus embedding depends only on static grid coordinates,
so it is precomputed host-side in NumPy with the exact oracle arithmetic;
only the base offset, the fBm loop and noise4 itself trace through JAX.

No jnp arrays are created at module import (TPU-relay invariant).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F32 = np.float32

# Ken Perlin's reference permutation (public domain), doubled like the C
# library's PERM[512].
_PERM = np.array([
    151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7, 225,
    140, 36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6, 148,
    247, 120, 234, 75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32,
    57, 177, 33, 88, 237, 149, 56, 87, 174, 20, 125, 136, 171, 168, 68, 175,
    74, 165, 71, 134, 139, 48, 27, 166, 77, 146, 158, 231, 83, 111, 229, 122,
    60, 211, 133, 230, 220, 105, 92, 41, 55, 46, 245, 40, 244, 102, 143, 54,
    65, 25, 63, 161, 1, 216, 80, 73, 209, 76, 132, 187, 208, 89, 18, 169,
    200, 196, 135, 130, 116, 188, 159, 86, 164, 100, 109, 198, 173, 186, 3,
    64, 52, 217, 226, 250, 124, 123, 5, 202, 38, 147, 118, 126, 255, 82, 85,
    212, 207, 206, 59, 227, 47, 16, 58, 17, 182, 189, 28, 42, 223, 183, 170,
    213, 119, 248, 152, 2, 44, 154, 163, 70, 221, 153, 101, 155, 167, 43,
    172, 9, 129, 22, 39, 253, 19, 98, 108, 110, 79, 113, 224, 232, 178, 185,
    112, 104, 218, 246, 97, 228, 251, 34, 242, 193, 238, 210, 144, 12, 191,
    179, 162, 241, 81, 51, 145, 235, 249, 14, 239, 107, 49, 192, 214, 31,
    181, 199, 106, 157, 184, 84, 204, 176, 115, 121, 50, 45, 127, 4, 150,
    254, 138, 236, 205, 93, 222, 114, 67, 29, 24, 72, 243, 141, 128, 195,
    78, 66, 215, 61, 156, 180,
], dtype=np.int32)
PERM512 = np.concatenate([_PERM, _PERM])

# 16 3D gradients; noise2 hashes into the first 12 (hash % 12).
GRAD3 = np.array([
    (1, 1, 0), (-1, 1, 0), (1, -1, 0), (-1, -1, 0),
    (1, 0, 1), (-1, 0, 1), (1, 0, -1), (-1, 0, -1),
    (0, 1, 1), (0, -1, 1), (0, 1, -1), (0, -1, -1),
    (1, 0, -1), (-1, 0, -1), (0, -1, 1), (0, 1, 1),
], dtype=np.float32)

# 32 4D gradients (hash & 0x1f).
GRAD4 = np.array([
    (0, 1, 1, 1), (0, 1, 1, -1), (0, 1, -1, 1), (0, 1, -1, -1),
    (0, -1, 1, 1), (0, -1, 1, -1), (0, -1, -1, 1), (0, -1, -1, -1),
    (1, 0, 1, 1), (1, 0, 1, -1), (1, 0, -1, 1), (1, 0, -1, -1),
    (-1, 0, 1, 1), (-1, 0, 1, -1), (-1, 0, -1, 1), (-1, 0, -1, -1),
    (1, 1, 0, 1), (1, 1, 0, -1), (1, -1, 0, 1), (1, -1, 0, -1),
    (-1, 1, 0, 1), (-1, 1, 0, -1), (-1, -1, 0, 1), (-1, -1, 0, -1),
    (1, 1, 1, 0), (1, 1, -1, 0), (1, -1, 1, 0), (1, -1, -1, 0),
    (-1, 1, 1, 0), (-1, 1, -1, 0), (-1, -1, 1, 0), (-1, -1, -1, 0),
], dtype=np.float32)

# Simplex corner traversal order by 6-bit comparison code (Gustavson).
SIMPLEX64 = np.array([
    (0, 1, 2, 3), (0, 1, 3, 2), (0, 0, 0, 0), (0, 2, 3, 1),
    (0, 0, 0, 0), (0, 0, 0, 0), (0, 0, 0, 0), (1, 2, 3, 0),
    (0, 2, 1, 3), (0, 0, 0, 0), (0, 3, 1, 2), (0, 3, 2, 1),
    (0, 0, 0, 0), (0, 0, 0, 0), (0, 0, 0, 0), (1, 3, 2, 0),
    (0, 0, 0, 0), (0, 0, 0, 0), (0, 0, 0, 0), (0, 0, 0, 0),
    (0, 0, 0, 0), (0, 0, 0, 0), (0, 0, 0, 0), (0, 0, 0, 0),
    (1, 2, 0, 3), (0, 0, 0, 0), (1, 3, 0, 2), (0, 0, 0, 0),
    (0, 0, 0, 0), (0, 0, 0, 0), (2, 3, 0, 1), (2, 3, 1, 0),
    (1, 0, 2, 3), (1, 0, 3, 2), (0, 0, 0, 0), (0, 0, 0, 0),
    (0, 0, 0, 0), (2, 0, 3, 1), (0, 0, 0, 0), (2, 1, 3, 0),
    (0, 0, 0, 0), (0, 0, 0, 0), (0, 0, 0, 0), (0, 0, 0, 0),
    (0, 0, 0, 0), (0, 0, 0, 0), (0, 0, 0, 0), (0, 0, 0, 0),
    (2, 0, 1, 3), (0, 0, 0, 0), (0, 0, 0, 0), (0, 0, 0, 0),
    (3, 0, 1, 2), (3, 0, 2, 1), (0, 0, 0, 0), (3, 1, 2, 0),
    (2, 1, 0, 3), (0, 0, 0, 0), (0, 0, 0, 0), (0, 0, 0, 0),
    (3, 1, 0, 2), (0, 0, 0, 0), (3, 2, 0, 1), (3, 2, 1, 0),
], dtype=np.int32)

_F2 = F32(0.3660254037844386)
_G2 = F32(0.21132486540518713)
_F4 = F32(0.30901699437494745)
_G4 = F32(0.1381966011250105)
_M_1_PI = 0.31830988618379067154
_M_PI_2 = 1.57079632679489661923


# ---------------------------------------------------------------------------
# Host-side (NumPy) torus embedding — static per grid, exact oracle math
# ---------------------------------------------------------------------------
def _np_fast_sin(x: np.ndarray) -> np.ndarray:
    """The C lib's parabola sine (float32, period 2*pi) — NumPy twin of
    tools/vendored_snoise.fast_sin."""
    x = (np.asarray(x, np.float64) * _M_1_PI).astype(F32)
    z = (x + F32(25165824.0)).astype(F32)
    x = (x - (z - F32(25165824.0))).astype(F32)
    y = (x - x * np.abs(x)).astype(F32)
    return (y * (F32(3.1) + F32(3.6) * np.abs(y))).astype(F32)


def _np_fast_cos(x: np.ndarray) -> np.ndarray:
    return _np_fast_sin((np.asarray(x, np.float64) + _M_PI_2).astype(F32))


def torus_embed(x, y, repeatx: float, repeaty: float):
    """C tiled path, seed-independent parts: maps grid coords onto the torus.

    Returns float32 numpy arrays (x_t, y_t, z_off, w_off); the caller adds
    `base` to z_off and w_off. Mirrors the snoise2 tiled branch exactly
    (y-axis first, then x-axis).
    """
    x = np.asarray(x)
    y = np.asarray(y)
    yf = (np.asarray(y, np.float64) * 2.0 / float(repeaty)).astype(F32)
    yr = F32(float(repeaty) * _M_1_PI * 0.5)
    y_t = (_np_fast_sin(yf) * yr).astype(F32)
    w_off = (_np_fast_cos(yf) * yr).astype(F32)
    xf = (np.asarray(x, np.float64) * 2.0 / float(repeatx)).astype(F32)
    xr = F32(float(repeatx) * _M_1_PI * 0.5)
    x_t = (_np_fast_sin(xf) * xr).astype(F32)
    z_off = (_np_fast_cos(xf) * xr).astype(F32)
    return x_t, y_t, z_off, w_off


# ---------------------------------------------------------------------------
# JAX noise kernels
# ---------------------------------------------------------------------------
def noise2(x, y):
    """2D simplex noise — caseman/noise `noise2` (float32, GRAD3 %12)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    s = (x + y) * _F2
    i = jnp.floor(x + s)
    j = jnp.floor(y + s)
    t = (i + j) * _G2

    x0 = x - (i - t)
    y0 = y - (j - t)
    i1 = (x0 > y0).astype(jnp.int32)
    j1 = 1 - i1
    x1 = x0 - i1.astype(jnp.float32) + _G2
    y1 = y0 - j1.astype(jnp.float32) + _G2
    c2 = F32(_G2 * F32(2.0) - F32(1.0))
    x2 = x0 + c2
    y2 = y0 + c2

    p = jnp.asarray(PERM512)
    g3 = jnp.asarray(GRAD3)
    ii = i.astype(jnp.int32) & 255
    jj = j.astype(jnp.int32) & 255
    g0 = p[ii + p[jj]] % 12
    g1 = p[ii + i1 + p[jj + j1]] % 12
    g2 = p[ii + 1 + p[jj + 1]] % 12

    total = jnp.zeros_like(x0)
    for xc, yc, g in ((x0, y0, g0), (x1, y1, g1), (x2, y2, g2)):
        f = F32(0.5) - xc * xc - yc * yc
        grad = g3[g, 0] * xc + g3[g, 1] * yc
        f2 = f * f
        total = total + jnp.where(f > 0, f2 * f2 * grad, 0.0)
    return total * F32(70.0)


def noise4(x, y, z, w):
    """4D simplex noise — caseman/noise `noise4` (float32, GRAD4 &0x1f)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    z = jnp.asarray(z, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    s = (x + y + z + w) * _F4
    i = jnp.floor(x + s)
    j = jnp.floor(y + s)
    k = jnp.floor(z + s)
    l = jnp.floor(w + s)
    t = (((i + j) + k) + l) * _G4

    x0 = x - (i - t)
    y0 = y - (j - t)
    z0 = z - (k - t)
    w0 = w - (l - t)

    c = ((x0 > y0).astype(jnp.int32) * 32 + (x0 > z0).astype(jnp.int32) * 16
         + (y0 > z0).astype(jnp.int32) * 8 + (x0 > w0).astype(jnp.int32) * 4
         + (y0 > w0).astype(jnp.int32) * 2 + (z0 > w0).astype(jnp.int32))
    ranks = jnp.asarray(SIMPLEX64)[c]            # (..., 4)
    off1 = (ranks >= 3).astype(jnp.int32)
    off2 = (ranks >= 2).astype(jnp.int32)
    off3 = (ranks >= 1).astype(jnp.int32)
    zeros = jnp.zeros_like(ranks)
    ones = jnp.ones_like(ranks)

    p = jnp.asarray(PERM512)
    g4 = jnp.asarray(GRAD4)
    ii = i.astype(jnp.int32) & 255
    jj = j.astype(jnp.int32) & 255
    kk = k.astype(jnp.int32) & 255
    ll = l.astype(jnp.int32) & 255

    total = jnp.zeros_like(x0)
    for m, off in enumerate((zeros, off1, off2, off3, ones)):
        gm = F32(float(m)) * _G4
        xc = x0 - off[..., 0].astype(jnp.float32) + gm
        yc = y0 - off[..., 1].astype(jnp.float32) + gm
        zc = z0 - off[..., 2].astype(jnp.float32) + gm
        wc = w0 - off[..., 3].astype(jnp.float32) + gm
        gi = p[ii + off[..., 0]
               + p[jj + off[..., 1]
                   + p[kk + off[..., 2] + p[ll + off[..., 3]]]]] & 0x1f
        f = F32(0.6) - xc * xc - yc * yc - zc * zc - wc * wc
        grad = (g4[gi, 0] * xc + g4[gi, 1] * yc + g4[gi, 2] * zc
                + g4[gi, 3] * wc)
        f2 = f * f
        total = total + jnp.where(f > 0, f2 * f2 * grad, 0.0)
    return total * F32(27.0)


# ---------------------------------------------------------------------------
# fBm dispatch matching py_snoise2
# ---------------------------------------------------------------------------
def snoise2_fbm(x, y, octaves=1, persistence=0.5, lacunarity=2.0, base=0.0):
    """Untiled py_snoise2: sum_k noise2(x*freq_k + base, y*freq_k + base)
    * amp_k / sum_k amp_k. `base` may be a traced scalar; x, y static or
    traced arrays. Amplitude weights follow the C float accumulation."""
    if octaves < 1:
        raise ValueError("octaves must be >= 1")
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    b = jnp.asarray(base, jnp.float32)
    freq = F32(1.0)
    amp = F32(1.0)
    maxv = F32(0.0)
    total = jnp.zeros_like(x)
    for _ in range(int(octaves)):
        total = total + noise2(x * freq + b, y * freq + b) * amp
        maxv = F32(maxv + amp)
        freq = F32(freq * F32(lacunarity))
        amp = F32(amp * F32(persistence))
    return total / maxv


def snoise2_tiled_fbm(x, y, octaves=1, persistence=0.5, lacunarity=2.0,
                      repeatx=1024.0, repeaty=1024.0, base=0.0):
    """Tiled py_snoise2 (both repeats): fBm over noise4 on the torus
    embedding. x, y must be STATIC numpy grids (the embedding is precomputed
    host-side with the oracle's exact float32 arithmetic); `base` may be a
    traced scalar — it is the terrain seed."""
    if octaves < 1:
        raise ValueError("octaves must be >= 1")
    x_t, y_t, z_off, w_off = torus_embed(x, y, repeatx, repeaty)
    b = jnp.asarray(base, jnp.float32)
    xj = jnp.asarray(x_t)
    yj = jnp.asarray(y_t)
    zj = b + jnp.asarray(z_off)
    wj = b + jnp.asarray(w_off)
    freq = F32(1.0)
    amp = F32(1.0)
    maxv = F32(1.0)
    total = noise4(xj, yj, zj, wj)
    for _ in range(1, int(octaves)):
        freq = F32(freq * F32(lacunarity))
        amp = F32(amp * F32(persistence))
        maxv = F32(maxv + amp)
        total = total + noise4(xj * freq, yj * freq, zj * freq,
                               wj * freq) * amp
    return total / maxv
