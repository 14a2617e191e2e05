"""Scalarized 3D math over tuples — the TPU layout workhorse.

Why tuples of scalars instead of (3,) / (3,3) arrays: under `vmap` over the
env batch B, an array-valued intermediate becomes (B, 3) or (B, 3, 3), whose
TPU tiling pads the minor dimensions to (8, 128) — a 40-100x memory blowup on
every intermediate, turning a ~3 kFLOP physics step into an HBM-bound 45 ms
batch step. A scalar-valued intermediate becomes a (B,) vector: batch rides
the 128-wide lane dimension with zero padding, and XLA fuses the whole scalar
chain into a handful of elementwise kernels.

Conventions:
  V3: tuple (x, y, z) of scalars (traced: (B,) arrays under vmap).
  M3: tuple of 3 V3 rows.
Python floats / numpy scalars mix freely (constant-folded at trace time).
"""
from __future__ import annotations

import jax.numpy as jnp


def v3(x, y, z):
    return (x, y, z)


def vadd(*vs):
    return tuple(sum(c) for c in zip(*vs))


def vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def vscale(v, s):
    return (v[0] * s, v[1] * s, v[2] * s)


def vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vcross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def vnormsq(v):
    return vdot(v, v)


def vnorm(v):
    return jnp.sqrt(vnormsq(v))


def vnormalize(v, eps=1e-9):
    inv = 1.0 / jnp.maximum(vnorm(v), eps)
    return vscale(v, inv)


def vzero():
    return (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))


def mrow(m, i):
    return m[i]


def mvec(m, v):
    """M @ v."""
    return (vdot(m[0], v), vdot(m[1], v), vdot(m[2], v))


def mtvec(m, v):
    """M^T @ v."""
    return (m[0][0] * v[0] + m[1][0] * v[1] + m[2][0] * v[2],
            m[0][1] * v[0] + m[1][1] * v[1] + m[2][1] * v[2],
            m[0][2] * v[0] + m[1][2] * v[1] + m[2][2] * v[2])


def mmul(a, b):
    """A @ B."""
    bt = mtranspose(b)
    return tuple(tuple(vdot(a[i], bt[j]) for j in range(3)) for i in range(3))


def mtranspose(m):
    return tuple(tuple(m[j][i] for j in range(3)) for i in range(3))


def madd(*ms):
    return tuple(vadd(*(m[i] for m in ms)) for i in range(3))


def msub(a, b):
    return tuple(vsub(a[i], b[i]) for i in range(3))


def mscale(m, s):
    return tuple(vscale(m[i], s) for i in range(3))


def mouter(u, v):
    """u v^T."""
    return tuple(tuple(u[i] * v[j] for j in range(3)) for i in range(3))


def meye(s=1.0):
    z = 0.0
    return ((s, z, z), (z, s, z), (z, z, s))


def quat_to_m3(q):
    """Rotation matrix rows from a wxyz quaternion tuple (w, x, y, z)."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return ((1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
            (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
            (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)))


def sym3_inv(m, eps=0.0):
    """Inverse of a symmetric 3x3 given as full M3 rows (Cramer/adjugate)."""
    a, b, c = m[0][0], m[0][1], m[0][2]
    d, e = m[1][1], m[1][2]
    f = m[2][2]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / (det + eps)
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    return ((A * inv_det, B * inv_det, C * inv_det),
            (B * inv_det, D * inv_det, E * inv_det),
            (C * inv_det, E * inv_det, F * inv_det))


def pack_v3(v):
    """V3 -> (3,) jnp array ((B, 3) under vmap at the boundary only)."""
    return jnp.stack(jnp.broadcast_arrays(*(jnp.asarray(c, jnp.float32) for c in v)), axis=-1)


def unpack_v3(a):
    """(..., 3) array -> V3 of (...,) scalars."""
    return (a[..., 0], a[..., 1], a[..., 2])


def pack_m3(m):
    return jnp.stack([pack_v3(r) for r in m], axis=-2)
