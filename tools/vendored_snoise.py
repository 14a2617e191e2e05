"""Vendored pure-NumPy reimplementation of the C `noise` package's snoise2.

The reference's perlin terrain (ballbot_gym/terrain/perlin.py:50-66) consumes
`noise.snoise2(x, y, octaves=4, persistence=0.2, lacunarity=2.0,
repeatx=1024, repeaty=1024, base=seed)`, and the gradient terrain's perlin
mode (ballbot_gym/terrain/gradient.py:74-80) consumes
`snoise2(x, y, octaves=3, persistence=0.3, base=seed)` (no repeats).
That C extension (caseman/noise, `_simplex.c`) is not installable here, so
this module reimplements its observable algorithm in NumPy with float32
arithmetic mirroring the C float computation order:

* **Untiled path** (no repeatx/repeaty): fBm over 2D simplex noise
  (`noise2`), with `base` ADDED TO THE COORDINATES each octave
  (`noise2(x*freq + base, y*freq + base)`), NOT a permutation offset.
* **Tiled path** (both repeats given — the perlin-terrain case): each axis is
  wrapped onto a circle of radius `repeat/(2*pi)` via the library's fast
  sine/cosine polynomial, `base` seeds the two circle-normal coordinates, and
  the result is fBm over **4D simplex noise** (`noise4`) on that torus
  embedding. Consequences worth knowing: the effective spatial frequency is
  divided by ~pi (small-angle sin), so `scale=25` yields features of
  characteristic size ~25*pi grid cells, and the value distribution is that
  of 4D (radius-0.6, x27) simplex noise, not 2D (x70).

Tables: Ken Perlin's public-domain permutation, the canonical GRAD3/GRAD4
gradient sets and the 64x4 simplex-corner-ordering table from Gustavson's
"Simplex noise demystified" — the same constants the C library embeds.

Provenance caveat (documented, not hidden): this is a from-memory, faithful
reconstruction of caseman/noise `_simplex.c` v1.2.x; the environment has no
copy of the C source or wheel to diff against (no egress). The fast_sin
polynomial is the devmaster parabola approximation the library uses; its two
published factorings are algebraically identical and differ only in float32
rounding order, so any residual mismatch with the real C extension is at the
few-ULP level of the torus coordinates. All parity tests in this repo compare
against THIS oracle; docs/design/parity.md records the caveat.
"""
from __future__ import annotations

import numpy as np

F32 = np.float32

# Ken Perlin's reference permutation, doubled (as the C lib's PERM[512]).
PERM = np.array([
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
], dtype=np.int64)
PERM = np.concatenate([PERM, PERM])

# 16 3D gradients (only the first 12 are addressed: hash % 12).
GRAD3 = np.array([
    (1, 1, 0), (-1, 1, 0), (1, -1, 0), (-1, -1, 0),
    (1, 0, 1), (-1, 0, 1), (1, 0, -1), (-1, 0, -1),
    (0, 1, 1), (0, -1, 1), (0, 1, -1), (0, -1, -1),
    (1, 0, -1), (-1, 0, -1), (0, -1, 1), (0, 1, 1),
], dtype=F32)

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
], dtype=F32)

# Simplex-corner traversal order, indexed by the 6-bit comparison code.
SIMPLEX = np.array([
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
], dtype=np.int64)

_F2 = F32(0.3660254037844386)     # 0.5 * (sqrt(3) - 1)
_G2 = F32(0.21132486540518713)    # (3 - sqrt(3)) / 6
_F4 = F32(0.30901699437494745)    # (sqrt(5) - 1) / 4
_G4 = F32(0.1381966011250105)     # (5 - sqrt(5)) / 20
_M_1_PI = 0.31830988618379067154  # double, as the C macro
_M_PI_2 = 1.57079632679489661923


def fast_sin(x):
    """The C lib's parabola sine (devmaster), float32, period 2*pi."""
    x = np.asarray(x)
    # x *= M_1_PI: double math, stored back to float
    x = (x.astype(np.float64) * _M_1_PI).astype(F32)
    # magic-number wrap of x into [-1, 1] (units of pi)
    z = (x + F32(25165824.0)).astype(F32)
    x = (x - (z - F32(25165824.0))).astype(F32)
    y = (x - x * np.abs(x)).astype(F32)
    return (y * (F32(3.1) + F32(3.6) * np.abs(y))).astype(F32)


def fast_cos(x):
    x = np.asarray(x)
    return fast_sin((x.astype(np.float64) + _M_PI_2).astype(F32))


def noise2(x, y):
    """2D simplex noise, caseman/noise `noise2` (float32, %12 GRAD3 hash)."""
    x = np.asarray(x, F32)
    y = np.asarray(y, F32)
    s = ((x + y) * _F2).astype(F32)
    i = np.floor((x + s).astype(F32))
    j = np.floor((y + s).astype(F32))
    t = ((i + j).astype(F32) * _G2).astype(F32)

    x0 = (x - (i - t).astype(F32)).astype(F32)
    y0 = (y - (j - t).astype(F32)).astype(F32)
    i1 = (x0 > y0).astype(np.int64)
    j1 = 1 - i1
    x1 = (x0 - i1.astype(F32) + _G2).astype(F32)
    y1 = (y0 - j1.astype(F32) + _G2).astype(F32)
    x2 = (x0 + F32(_G2 * F32(2.0) - F32(1.0))).astype(F32)
    y2 = (y0 + F32(_G2 * F32(2.0) - F32(1.0))).astype(F32)

    ii = i.astype(np.int64) & 255
    jj = j.astype(np.int64) & 255
    g0 = PERM[ii + PERM[jj]] % 12
    g1 = PERM[ii + i1 + PERM[jj + j1]] % 12
    g2 = PERM[ii + 1 + PERM[jj + 1]] % 12

    total = np.zeros_like(x0)
    for (xc, yc, g) in ((x0, y0, g0), (x1, y1, g1), (x2, y2, g2)):
        f = (F32(0.5) - xc * xc - yc * yc).astype(F32)
        grad = (GRAD3[g, 0] * xc + GRAD3[g, 1] * yc).astype(F32)
        contrib = (((f * f).astype(F32) * (f * f).astype(F32)).astype(F32)
                   * grad).astype(F32)
        total = (total + np.where(f > 0, contrib, F32(0.0))).astype(F32)
    return (total * F32(70.0)).astype(F32)


def noise4(x, y, z, w):
    """4D simplex noise, caseman/noise `noise4` (float32, &0x1f GRAD4 hash)."""
    x = np.asarray(x, F32)
    y = np.asarray(y, F32)
    z = np.asarray(z, F32)
    w = np.asarray(w, F32)
    s = ((x + y + z + w) * _F4).astype(F32)
    i = np.floor((x + s).astype(F32))
    j = np.floor((y + s).astype(F32))
    k = np.floor((z + s).astype(F32))
    l = np.floor((w + s).astype(F32))
    t = ((((i + j).astype(F32) + k).astype(F32) + l).astype(F32)
         * _G4).astype(F32)

    x0 = (x - (i - t).astype(F32)).astype(F32)
    y0 = (y - (j - t).astype(F32)).astype(F32)
    z0 = (z - (k - t).astype(F32)).astype(F32)
    w0 = (w - (l - t).astype(F32)).astype(F32)

    c = ((x0 > y0).astype(np.int64) * 32 + (x0 > z0) * 16 + (y0 > z0) * 8
         + (x0 > w0) * 4 + (y0 > w0) * 2 + (z0 > w0) * 1)
    ranks = SIMPLEX[c]                      # (..., 4)
    off1 = (ranks >= 3).astype(np.int64)    # i1,j1,k1,l1
    off2 = (ranks >= 2).astype(np.int64)
    off3 = (ranks >= 1).astype(np.int64)

    def corner(ox, radius_off, gmul):
        xc = (x0 - ox[..., 0].astype(F32) + F32(gmul) * _G4).astype(F32)
        yc = (y0 - ox[..., 1].astype(F32) + F32(gmul) * _G4).astype(F32)
        zc = (z0 - ox[..., 2].astype(F32) + F32(gmul) * _G4).astype(F32)
        wc = (w0 - ox[..., 3].astype(F32) + F32(gmul) * _G4).astype(F32)
        return xc, yc, zc, wc

    ii = i.astype(np.int64) & 255
    jj = j.astype(np.int64) & 255
    kk = k.astype(np.int64) & 255
    ll = l.astype(np.int64) & 255

    def hash4(di, dj, dk, dl):
        return PERM[ii + di + PERM[jj + dj + PERM[kk + dk + PERM[ll + dl]]]] & 0x1f

    zeros = np.zeros(ranks.shape, np.int64)
    ones = np.ones(ranks.shape, np.int64)
    corners = [
        (corner(zeros, None, 0.0), hash4(0, 0, 0, 0)),
        (corner(off1, None, 1.0),
         hash4(off1[..., 0], off1[..., 1], off1[..., 2], off1[..., 3])),
        (corner(off2, None, 2.0),
         hash4(off2[..., 0], off2[..., 1], off2[..., 2], off2[..., 3])),
        (corner(off3, None, 3.0),
         hash4(off3[..., 0], off3[..., 1], off3[..., 2], off3[..., 3])),
        (corner(ones, None, 4.0), hash4(1, 1, 1, 1)),
    ]
    # corner 0 has no offset subtraction in the C code (x0 directly); the
    # gmul=0 path above subtracts 0 and adds 0*G4 = identical values.
    total = np.zeros_like(x0)
    for (xc, yc, zc, wc), g in corners:
        f = (F32(0.6) - xc * xc - yc * yc - zc * zc - wc * wc).astype(F32)
        grad = (GRAD4[g, 0] * xc + GRAD4[g, 1] * yc + GRAD4[g, 2] * zc
                + GRAD4[g, 3] * wc).astype(F32)
        f2 = (f * f).astype(F32)
        contrib = ((f2 * f2).astype(F32) * grad).astype(F32)
        total = (total + np.where(f > 0, contrib, F32(0.0))).astype(F32)
    return (total * F32(27.0)).astype(F32)


def _fbm(noise_fn, coords, octaves, persistence, lacunarity):
    """C fbm loop: total = n(c); for 1..oct-1: freq*=lac; amp*=per;
    max+=amp; total += n(c*freq)*amp; return total/max (all float32)."""
    persistence = F32(persistence)
    lacunarity = F32(lacunarity)
    freq = F32(1.0)
    amp = F32(1.0)
    maxv = F32(1.0)
    total = noise_fn(*coords).astype(F32)
    for _ in range(1, int(octaves)):
        freq = F32(freq * lacunarity)
        amp = F32(amp * persistence)
        maxv = F32(maxv + amp)
        scaled = tuple((c * freq).astype(F32) for c in coords)
        total = (total + noise_fn(*scaled) * amp).astype(F32)
    return (total / maxv).astype(F32)


def snoise2(x, y, octaves=1, persistence=0.5, lacunarity=2.0,
            repeatx=None, repeaty=None, base=0.0):
    """py_snoise2 dispatch. Vectorized over x, y (base is scalar).

    Matches the C extension's two code paths the reference exercises:
    untiled fBm-of-noise2 with coordinate-shift base, and the both-repeats
    torus fbm_noise4 path. A single repeat (the fbm_noise3 path) is not
    used by the reference and is not implemented.
    """
    if octaves < 1:
        raise ValueError("octaves must be >= 1")
    x = np.asarray(x, F32)
    y = np.asarray(y, F32)
    z = F32(base)
    if repeatx is None and repeaty is None:
        # flat path: noise2(x*freq + z, y*freq + z) octave sum
        persistence = F32(persistence)
        lacunarity = F32(lacunarity)
        freq = F32(1.0)
        amp = F32(1.0)
        maxv = F32(0.0)
        total = np.zeros_like(x)
        for _ in range(int(octaves)):
            total = (total + noise2((x * freq + z).astype(F32),
                                    (y * freq + z).astype(F32))
                     * amp).astype(F32)
            maxv = F32(maxv + amp)
            freq = F32(freq * lacunarity)
            amp = F32(amp * persistence)
        return (total / maxv).astype(F32)
    if repeatx is None or repeaty is None:
        raise NotImplementedError("single-repeat (fbm_noise3) path not vendored")
    # tiled path: wrap each axis onto a circle, fbm over 4D noise
    w = np.full_like(x, z)
    yf = (np.asarray(y, np.float64) * 2.0 / float(repeaty)).astype(F32)
    yr = F32(float(repeaty) * _M_1_PI * 0.5)
    y = (fast_sin(yf) * yr).astype(F32)
    w = (w + fast_cos(yf) * yr).astype(F32)
    xf = (np.asarray(x, np.float64) * 2.0 / float(repeatx)).astype(F32)
    xr = F32(float(repeatx) * _M_1_PI * 0.5)
    zc = (np.full_like(x, z) + fast_cos(xf) * xr).astype(F32)
    x = (fast_sin(xf) * xr).astype(F32)
    return _fbm(noise4, (x, y, zc, w), octaves, persistence, lacunarity)


def generate_perlin_terrain_oracle(n, scale=25.0, octaves=4, persistence=0.2,
                                   lacunarity=2.0, amplitude=1.0, seed=0):
    """The reference's generate_perlin_terrain (perlin.py:45-74) over this
    vendored snoise2: row-major (n*n,) array in [0, 1]."""
    assert n % 2 == 1
    idx = np.arange(n, dtype=np.float64) / float(scale)
    X, Y = np.meshgrid(idx, idx, indexing="ij")
    noise_val = snoise2(X, Y, octaves=octaves, persistence=persistence,
                        lacunarity=lacunarity, repeatx=1024, repeaty=1024,
                        base=seed)
    # reference does the post-map in float64 (numpy default terrain array)
    norm = (noise_val.astype(np.float64) + 1.0) / 2.0 * float(amplitude)
    return np.clip(norm, 0.0, 1.0).reshape(-1)
