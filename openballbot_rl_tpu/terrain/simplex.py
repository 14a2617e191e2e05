"""2D simplex noise in pure JAX, with fBm octaves.

Functional counterpart of the `noise` package's `snoise2` consumed by the
reference perlin terrain (ballbot_gym/terrain/perlin.py:50-66): Gustavson-style
2D simplex noise over Ken Perlin's reference permutation table, combined into
fractional Brownian motion with (octaves, persistence, lacunarity) semantics
and a `base` integer that reseeds by offsetting permutation lookups.

NOTE on parity: bit-exact parity with the C `noise` library cannot be verified
in this environment (package absent, no egress). This implementation is the
framework's own golden reference: the native C++ twin (native/noisecore) and
this JAX version are tested to agree, and terrain statistics (range,
smoothness, seed sensitivity) are asserted against the reference's documented
behavior instead.

Vectorized: evaluates noise on whole coordinate arrays; permutation lookups
are gathers from a constant (512,) table — TPU-friendly.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Ken Perlin's reference permutation (public domain, used by virtually every
# simplex/perlin implementation including the `noise` package).
_PERM = np.array([
    151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7, 225,
    140, 36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6, 148,
    247, 120, 234, 75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32,
    57, 177, 33, 88, 237, 149, 56, 87, 174, 20, 125, 136, 171, 168, 68, 175,
    74, 165, 71, 134, 139, 48, 27, 166, 77, 146, 158, 231, 83, 111, 229, 122,
    60, 211, 133, 230, 220, 105, 92, 41, 55, 46, 245, 40, 244, 102, 143, 54,
    65, 25, 63, 161, 1, 216, 80, 73, 209, 76, 132, 187, 208, 89, 18, 169,
    200, 196, 135, 130, 116, 188, 159, 86, 164, 100, 109, 198, 173, 186, 3, 64,
    52, 217, 226, 250, 124, 123, 5, 202, 38, 147, 118, 126, 255, 82, 85, 212,
    207, 206, 59, 227, 47, 16, 58, 17, 182, 189, 28, 42, 223, 183, 170, 213,
    119, 248, 152, 2, 44, 154, 163, 70, 221, 153, 101, 155, 167, 43, 172, 9,
    129, 22, 39, 253, 19, 98, 108, 110, 79, 113, 224, 232, 178, 185, 112, 104,
    218, 246, 97, 228, 251, 34, 242, 193, 238, 210, 144, 12, 191, 179, 162, 241,
    81, 51, 145, 235, 249, 14, 239, 107, 49, 192, 214, 31, 181, 199, 106, 157,
    184, 84, 204, 176, 115, 121, 50, 45, 127, 4, 150, 254, 138, 236, 205, 93,
    222, 114, 67, 29, 24, 72, 243, 141, 128, 195, 78, 66, 215, 61, 156, 180,
], dtype=np.int32)
PERM512 = np.concatenate([_PERM, _PERM])  # numpy: no backend init at import

# 8 gradient directions used by Gustavson's 2D simplex reference.
_GRAD2 = np.array([
    (1, 1), (-1, 1), (1, -1), (-1, -1),
    (1, 0), (-1, 0), (0, 1), (0, -1),
], dtype=np.float32)
GRAD2 = _GRAD2  # numpy: converted to a constant at trace time

_F2 = 0.5 * (np.sqrt(3.0) - 1.0)
_G2 = (3.0 - np.sqrt(3.0)) / 6.0


def _grad_dot(hash_val, x, y):
    g = jnp.asarray(GRAD2)[hash_val & 7]
    return g[..., 0] * x + g[..., 1] * y


def snoise2(x, y, base=0):
    """Raw 2D simplex noise in ~[-1, 1]. x, y: arrays; base: int32 seed offset."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    base = jnp.asarray(base, jnp.int32)

    s = (x + y) * _F2
    i = jnp.floor(x + s).astype(jnp.int32)
    j = jnp.floor(y + s).astype(jnp.int32)
    t = (i + j).astype(jnp.float32) * _G2
    x0 = x - (i.astype(jnp.float32) - t)
    y0 = y - (j.astype(jnp.float32) - t)

    upper = x0 > y0
    i1 = jnp.where(upper, 1, 0)
    j1 = jnp.where(upper, 0, 1)

    x1 = x0 - i1.astype(jnp.float32) + _G2
    y1 = y0 - j1.astype(jnp.float32) + _G2
    x2 = x0 - 1.0 + 2.0 * _G2
    y2 = y0 - 1.0 + 2.0 * _G2

    ii = (i & 255)
    jj = (j & 255)
    # base reseeds by offsetting the inner permutation lookup
    p = jnp.asarray(PERM512)
    gi0 = p[ii + p[(jj + base) & 255]]
    gi1 = p[ii + i1 + p[(jj + j1 + base) & 255]]
    gi2 = p[ii + 1 + p[(jj + 1 + base) & 255]]

    def corner(xc, yc, gi):
        tt = 0.5 - xc * xc - yc * yc
        tt = jnp.maximum(tt, 0.0)
        t4 = tt * tt * tt * tt
        return t4 * _grad_dot(gi, xc, yc)

    n0 = corner(x0, y0, gi0)
    n1 = corner(x1, y1, gi1)
    n2 = corner(x2, y2, gi2)
    return 70.0 * (n0 + n1 + n2)


def fbm2(x, y, octaves=1, persistence=0.5, lacunarity=2.0, base=0):
    """Fractional Brownian motion over snoise2 (snoise2 octave semantics:
    sum(noise(x*l^k, y*l^k) * p^k) / sum(p^k))."""
    if octaves < 1:
        raise ValueError("octaves must be >= 1")
    total = jnp.zeros_like(jnp.asarray(x, jnp.float32))
    freq = 1.0
    amp = 1.0
    max_amp = 0.0
    for _ in range(int(octaves)):
        total = total + snoise2(x * freq, y * freq, base=base) * amp
        max_amp += amp
        freq *= lacunarity
        amp *= persistence
    return total / max_amp
