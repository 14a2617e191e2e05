"""Batched depth cameras as an analytic raycaster (pure JAX).

TPU-native replacement for the reference's OpenGL depth rendering
(ballbot_gym/sensors/rgbd.py:10-108: two mujoco.Renderer instances with
enable_depth_rendering, depth clipped at 1.0 to kill skybox artifacts).
Rendering a 64x64 z-buffer per camera per env on a GPU rasterizer does not
batch; casting 4096 rays against {heightfield, sphere, capsules} as array ops
does.

Camera model (exact extrinsics from the compiled reference model;
ballbot.xml:44-54):
    cam_0: pos (+0.17, -0.01, -0.06), R = Ry(-30 deg)  in the base frame
    cam_1: pos (-0.17, -0.01, -0.06), R = Ry(+30 deg)
    fovy 90, looks along -z (MuJoCo convention: x right, y up), i.e. tilted
    30 degrees inward toward the ball-ground contact.

Depth semantics match the reference obs: z-buffer distance (meters) along the
camera axis, clipped to [0, 1] (rgbd.py:69-73); rays that miss within 1 m
return 1.0.

Scene: heightfield (sphere-traced against the bilinear surface: coarse fixed
march + bisection refine) + the ball (analytic ray-sphere). Wheel capsules /
tower are below/behind the cameras' 1 m frustum toward the ground and are
omitted (conscious deviation; the ball and terrain dominate the image).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openballbot_rl_tpu.physics.rotations import quat_to_mat

# camera constants in the base frame (derived from the compiled model)
_C30 = math.sqrt(3.0) / 2.0
CAM_POS_B = np.array([[0.17, -0.01, -0.06],
                      [-0.17, -0.01, -0.06]], np.float32)
CAM_ROT_B = np.array([
    [[_C30, 0.0, 0.5], [0.0, 1.0, 0.0], [-0.5, 0.0, _C30]],   # Ry(-30)
    [[_C30, 0.0, -0.5], [0.0, 1.0, 0.0], [0.5, 0.0, _C30]],   # Ry(+30)
], np.float32)


@dataclasses.dataclass(frozen=True)
class DepthCameraConfig:
    height: int = 64            # ballbot_env.py im_shape default
    width: int = 64
    max_depth: float = 1.0      # rgbd.py:69-73 clip
    znear: float = 1e-4         # ballbot.xml:8
    coarse_steps: int = 40      # fixed march resolution (~3 cm at 1.2 m)
    refine_steps: int = 6       # bisection iterations
    t_max: float = 1.2          # march horizon (> max_depth / cos view angle)


def _pixel_dirs(cfg: DepthCameraConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Per-pixel unit ray directions in the camera frame + axial components.

    fovy 90 -> half-height tan = 1; square pixels. Row 0 = image top (+y).
    Returns dirs (H, W, 3) and inv_norm (H, W) = |d_z| of the unit dir, so
    that z-depth = t_hit * inv_norm.
    """
    H, W = cfg.height, cfg.width
    half_h = 1.0  # tan(90/2)
    half_w = half_h * W / H
    v = (1.0 - 2.0 * (np.arange(H) + 0.5) / H) * half_h   # +y at top
    u = (2.0 * (np.arange(W) + 0.5) / W - 1.0) * half_w
    U, V = np.meshgrid(u, v)
    d = np.stack([U, V, -np.ones_like(U)], axis=-1)
    norm = np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = (d / norm).astype(np.float32)
    inv_norm = (1.0 / norm[..., 0]).astype(np.float32)     # = |d_z| after norm
    return dirs, inv_norm


class DepthCameras:
    """Renders the two base-mounted depth cameras for one env state.

    __call__(sampler, base_pos, base_quat, ball_pos) -> (2, H, W) float32
    depth in [0, 1]. vmap over envs for batching.
    """

    def __init__(self, cfg: DepthCameraConfig = DepthCameraConfig(),
                 ball_radius: float = 0.09):
        self.cfg = cfg
        self.ball_radius = ball_radius
        dirs, axial = _pixel_dirs(cfg)
        self._dirs = jnp.asarray(dirs)           # (H, W, 3) cam frame
        self._axial = jnp.asarray(axial)         # (H, W)
        self._cam_pos = jnp.asarray(CAM_POS_B)
        self._cam_rot = jnp.asarray(CAM_ROT_B)

    def __call__(self, sampler: Callable, base_pos, base_quat, ball_pos):
        cfg = self.cfg
        R = quat_to_mat(base_quat)

        def render_cam(cam_idx):
            origin = base_pos + R @ self._cam_pos[cam_idx]
            Rcw = R @ self._cam_rot[cam_idx]                 # cam -> world
            dirs_w = jnp.einsum("ij,hwj->hwi", Rcw, self._dirs)  # (H,W,3)

            # --- ball: analytic ray-sphere ---
            oc = origin - ball_pos
            b = jnp.einsum("hwi,i->hw", dirs_w, oc)
            c = jnp.dot(oc, oc) - self.ball_radius ** 2
            disc = b * b - c
            t_ball = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
            t_ball = jnp.where((disc > 0) & (t_ball > cfg.znear), t_ball, jnp.inf)

            # --- terrain: coarse march + bisection ---
            # the march runs as a scan over the ray parameter so memory
            # stays (H, W) per env regardless of coarse_steps — a batched
            # materialization is (B, steps, H, W, 3) and OOMs at scale
            ts = jnp.linspace(cfg.znear, cfg.t_max, cfg.coarse_steps)
            dt_march = (cfg.t_max - cfg.znear) / (cfg.coarse_steps - 1)

            def below(t):
                pt = origin[None, None, :] + t[..., None] * dirs_w
                h, _, _ = sampler(pt[..., 0], pt[..., 1])
                return pt[..., 2] < h

            def march(carry, t):
                hit_any, t_hit = carry
                b = below(jnp.full(dirs_w.shape[:2], t))
                first_cross = b & ~hit_any
                t_hit = jnp.where(first_cross, t, t_hit)
                return (hit_any | b, t_hit), None

            (hit_any, t_hi), _ = jax.lax.scan(
                march, (jnp.zeros(dirs_w.shape[:2], bool),
                        jnp.full(dirs_w.shape[:2], cfg.t_max)), ts)
            t_lo = jnp.maximum(t_hi - dt_march, cfg.znear)

            def bisect(carry, _):
                t_lo, t_hi = carry
                mid = 0.5 * (t_lo + t_hi)
                b = below(mid)
                return (jnp.where(b, t_lo, mid), jnp.where(b, mid, t_hi)), None

            (t_lo, t_hi), _ = jax.lax.scan(
                bisect, (t_lo, t_hi), None, length=cfg.refine_steps)
            t_terr = jnp.where(hit_any, 0.5 * (t_lo + t_hi), jnp.inf)

            t_hit = jnp.minimum(t_ball, t_terr)
            depth = t_hit * self._axial                      # z-buffer depth
            return jnp.clip(depth, 0.0, cfg.max_depth)

        return jnp.stack([render_cam(0), render_cam(1)])
