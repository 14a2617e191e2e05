"""Third-person scene rendering as an analytic raytracer (pure JAX).

The reference records videos through MuJoCo's OpenGL renderer and a
`world_view` camera (ballbot.xml:32, callbacks.py:210-231). The TPU-native
equivalent reuses the depth-raycasting machinery (sensors/depth.py) for a
shaded RGB render: rays against {heightfield, ball sphere, tower capsule,
wheel spheres}, Lambertian shading, per-object colors, sky background —
batched over frames with vmap, so a whole episode renders in one jit call.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from openballbot_rl_tpu.physics.rotations import quat_to_mat

# object colors (RGB in [0,1]) — kept as NUMPY so importing this module
# never initializes a JAX backend (host-side tools import viz.plots while a
# TPU job may hold the one-client axon relay); converted to jnp constants at
# trace time inside render_scene.
_COL_TERRAIN = np.array([0.55, 0.47, 0.36], np.float32)
_COL_BALL = np.array([0.85, 0.45, 0.15], np.float32)   # basketball
_COL_TOWER = np.array([0.18, 0.8, 0.44], np.float32)   # ballbot.xml tower rgba
_COL_WHEEL = np.array([0.85, 0.1, 0.1], np.float32)
_COL_SKY = np.array([0.65, 0.80, 0.95], np.float32)
_SUN_NP = np.array([0.35, 0.25, 0.9], np.float32)
_SUN = _SUN_NP / np.linalg.norm(_SUN_NP)


def _ray_sphere(origin, dirs, center, radius):
    oc = origin - center
    b = jnp.einsum("hwi,i->hw", dirs, oc)
    c = jnp.dot(oc, oc) - radius * radius
    disc = b * b - c
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    t = jnp.where((disc > 0) & (t > 1e-4), t, jnp.inf)
    n = (origin + t[..., None] * dirs - center)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return t, n


def _ray_capsule(origin, dirs, pa, pb, radius):
    """Ray vs capsule segment pa-pb (approximate: closest-approach iteration)."""
    ba = pb - pa
    len2 = jnp.dot(ba, ba)

    def sphere_at(s):
        return pa + jnp.clip(s, 0.0, 1.0) * ba

    # initial guess: project midpoint hit; 3 fixed refinements
    t, _ = _ray_sphere(origin, dirs, 0.5 * (pa + pb),
                       radius + 0.5 * jnp.sqrt(len2))
    s = jnp.zeros_like(t)
    for _ in range(3):
        p = origin + jnp.where(jnp.isfinite(t), t, 0.0)[..., None] * dirs
        s = jnp.einsum("hwi,i->hw", p - pa, ba) / jnp.maximum(len2, 1e-9)
        c = sphere_at(s[..., None] * jnp.ones_like(ba))
        cen = pa + jnp.clip(s, 0, 1)[..., None] * ba
        oc = origin - cen
        b = jnp.einsum("hwi,hwi->hw", dirs, oc)
        cc = jnp.einsum("hwi,hwi->hw", oc, oc) - radius * radius
        disc = b * b - cc
        t = jnp.where(disc > 0, -b - jnp.sqrt(jnp.maximum(disc, 0.0)), jnp.inf)
        t = jnp.where(t > 1e-4, t, jnp.inf)
    p = origin + jnp.where(jnp.isfinite(t), t, 0.0)[..., None] * dirs
    cen = pa + jnp.clip(s, 0, 1)[..., None] * ba
    n = p - cen
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return t, n


def _ray_terrain(sampler, origin, dirs, t_max=8.0, coarse=96, refine=8):
    ts = jnp.linspace(0.05, t_max, coarse)

    def below(t):
        pt = origin[None, None, :] + t[..., None] * dirs
        h, _, _ = sampler(pt[..., 0], pt[..., 1])
        return pt[..., 2] < h

    bel = jax.vmap(lambda t: below(jnp.full(dirs.shape[:2], t)))(ts)
    hit = jnp.any(bel, axis=0)
    first = jnp.argmax(bel, axis=0)
    t_hi = ts[first]
    t_lo = ts[jnp.maximum(first - 1, 0)]
    for _ in range(refine):
        mid = 0.5 * (t_lo + t_hi)
        b = below(mid)
        t_lo = jnp.where(b, t_lo, mid)
        t_hi = jnp.where(b, mid, t_hi)
    t = jnp.where(hit, 0.5 * (t_lo + t_hi), jnp.inf)
    pt = origin[None, None, :] + jnp.where(hit, t, 0.0)[..., None] * dirs
    _, gx, gy = sampler(pt[..., 0], pt[..., 1])
    inv = 1.0 / jnp.sqrt(1.0 + gx * gx + gy * gy)
    n = jnp.stack([-gx * inv, -gy * inv, inv], axis=-1)
    return t, n


def _look_at(cam_pos, target, up=(0.0, 0.0, 1.0)):
    f = target - cam_pos
    f = f / jnp.linalg.norm(f)
    r = jnp.cross(f, jnp.asarray(up, jnp.float32))
    r = r / jnp.maximum(jnp.linalg.norm(r), 1e-9)
    u = jnp.cross(r, f)
    return jnp.stack([r, u, -f], axis=1)     # cam->world (x right, y up, -z fwd)


def render_scene(sampler: Callable, base_pos, base_quat, ball_pos,
                 wheel_coms_w=None, cam_offset=(0.0, -2.0, 1.5),
                 height: int = 240, width: int = 320,
                 fovy_deg: float = 60.0):
    """One shaded RGB frame (H, W, 3) float32 in [0, 1].

    Camera follows the robot: positioned at ball_pos.xy + cam_offset looking
    at the base (reference world_view camera geometry, ballbot.xml:32).
    """
    target = base_pos
    cam_pos = jnp.asarray(
        [ball_pos[0] + cam_offset[0], ball_pos[1] + cam_offset[1],
         ball_pos[2] + cam_offset[2]], jnp.float32)
    Rcw = _look_at(cam_pos, target)

    half_h = math.tan(math.radians(fovy_deg) / 2.0)
    half_w = half_h * width / height
    v = (1.0 - 2.0 * (jnp.arange(height) + 0.5) / height) * half_h
    u = (2.0 * (jnp.arange(width) + 0.5) / width - 1.0) * half_w
    U, V = jnp.meshgrid(u, v)
    d = jnp.stack([U, V, -jnp.ones_like(U)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.einsum("ij,hwj->hwi", Rcw, d)

    R = quat_to_mat(base_quat)
    hits = []   # (t, normal, color)

    t, n = _ray_terrain(sampler, cam_pos, dirs)
    # checkerboard tint for motion perception
    p = cam_pos[None, None, :] + jnp.where(jnp.isfinite(t), t, 0.0)[..., None] * dirs
    checker = ((jnp.floor(p[..., 0] * 2) + jnp.floor(p[..., 1] * 2)) % 2)
    col_t = _COL_TERRAIN * (0.9 + 0.1 * checker[..., None])
    hits.append((t, n, col_t))

    t, n = _ray_sphere(cam_pos, dirs, ball_pos, 0.09)
    hits.append((t, n, _COL_BALL))

    pa = base_pos + R @ jnp.array([0.0, 0.0, 0.06], jnp.float32)
    pb = base_pos + R @ jnp.array([0.0, 0.0, 0.34], jnp.float32)
    t, n = _ray_capsule(cam_pos, dirs, pa, pb, 0.11)
    hits.append((t, n, _COL_TOWER))

    if wheel_coms_w is not None:
        for k in range(3):
            t, n = _ray_sphere(cam_pos, dirs, wheel_coms_w[k], 0.04)
            hits.append((t, n, _COL_WHEEL))

    t_best = jnp.full(dirs.shape[:2], jnp.inf)
    color = jnp.broadcast_to(_COL_SKY, dirs.shape[:2] + (3,))
    for t, n, col in hits:
        lam = jnp.clip(jnp.einsum("hwi,i->hw", n, _SUN), 0.0, 1.0)
        shade = (0.35 + 0.65 * lam)[..., None] * col
        better = t < t_best
        t_best = jnp.where(better, t, t_best)
        color = jnp.where(better[..., None], shade, color)
    # degenerate poses (robot lying inside geometry, grazing rays) can leak
    # NaN into individual pixels; clamp defensively — this is visualization
    return jnp.nan_to_num(jnp.clip(color, 0.0, 1.0), nan=0.0)


def wheel_coms_world(model, base_pos, base_quat):
    R = quat_to_mat(base_quat)
    return [base_pos + R @ jnp.asarray(model.wheel_com[k], jnp.float32)
            for k in range(3)]


def save_video(frames: np.ndarray, path: str, fps: int = 30) -> str:
    """frames: (T, H, W, 3) float in [0,1] -> mp4 (cv2) or GIF fallback."""
    import os

    frames8 = (np.clip(np.asarray(frames), 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith(".mp4"):
        import cv2

        h, w = frames8.shape[1:3]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        ok = vw.isOpened()
        if ok:
            for f in frames8:
                vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            vw.release()
            return path
        path = path[:-4] + ".gif"
    from PIL import Image

    ims = [Image.fromarray(f) for f in frames8]
    ims[0].save(path, save_all=True, append_images=ims[1:],
                duration=int(1000 / fps), loop=0)
    return path
