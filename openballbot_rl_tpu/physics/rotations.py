"""Quaternion / rotation utilities (pure JAX, fp32-friendly).

Conventions:
  - Quaternions are (w, x, y, z), unit norm.
  - All angular velocities are expressed in the WORLD frame unless noted.
    (This differs from MuJoCo's free-joint local-frame angular velocity; the
    framework is self-consistent and converts at its MuJoCo-oracle test
    boundary only.)
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (body->world if q is body orientation)."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    # v' = v + 2 qw (qv x v) + 2 qv x (qv x v)
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix R such that R @ v_body = v_world."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """axis must be unit norm; angle in radians (broadcastable)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate([
        jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def axis_angle_rotate(axis: jnp.ndarray, angle: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation of v about unit axis by angle."""
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    return v * c + jnp.cross(axis, v) * s + axis * (jnp.sum(axis * v, axis=-1, keepdims=True)) * (1 - c)


def quat_deriv(q: jnp.ndarray, omega_world: jnp.ndarray) -> jnp.ndarray:
    """dq/dt = 0.5 * (0, omega_world) ⊗ q."""
    zero = jnp.zeros(omega_world.shape[:-1] + (1,), dtype=q.dtype)
    omega_q = jnp.concatenate([zero, omega_world], axis=-1)
    return 0.5 * quat_mul(omega_q, q)


def quat_to_rotvec(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector (axis * angle) from quaternion.

    Matches `quaternion.as_rotation_vector` semantics used by the reference
    (ballbot_env.py:778-779): angle in [0, 2*pi) direction of the vector part.
    Numerically safe near identity via first-order expansion.
    """
    w = q[..., 0]
    v = q[..., 1:4]
    norm_v = jnp.linalg.norm(v, axis=-1)
    # angle = 2 * atan2(|v|, w) in [0, 2pi) for w possibly negative
    angle = 2.0 * jnp.arctan2(norm_v, w)
    scale = jnp.where(norm_v > 1e-8, angle / jnp.maximum(norm_v, 1e-20), 2.0)
    return v * scale[..., None]


def rotvec_to_quat(rv: jnp.ndarray) -> jnp.ndarray:
    angle = jnp.linalg.norm(rv, axis=-1)
    small = angle < 1e-8
    axis = rv / jnp.maximum(angle, 1e-20)[..., None]
    q = quat_from_axis_angle(axis, angle)
    identity = jnp.zeros_like(q).at[..., 0].set(1.0)
    return jnp.where(small[..., None], identity, q)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix [v]x such that [v]x @ u = v x u."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y,
                   z, zero, -x,
                   -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))
