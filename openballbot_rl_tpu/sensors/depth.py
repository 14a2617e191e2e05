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

Three rendering paths:
  * __call__       — exact marcher (oracle; per-pixel bilinear taps)
  * render_patch   — the TPU hot path: both cameras stacked, local patch
                     slice -> constant-matrix polar resample (MXU) ->
                     per-ray closed-form profile crossing (fused masked
                     min-reduction). ~9 ms for a 512-env 2x64x64 render on
                     v5e; accuracy vs the exact marcher mean ~2 mm, p95
                     ~1 cm (silhouettes). See docs/guides/performance.md.
  * render_rgbd    — RGB+depth compat mode (reference depth_only=False)
render_patch_einsum keeps the per-env tent-einsum formulation as the A/B
reference for render_patch.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openballbot_rl_tpu.physics.rotations import quat_to_mat

# polar profile resolution of the patch fast path (render_patch): ~3.75 deg
# x 3.7 cm — comparable to the 64x64 camera's own pixel footprint at the 1 m
# depth clip
_NTH, _NS = 96, 48

# RGB compat-mode palette, calibrated per object class against the
# reference's real OpenGL renders (tools/fit_rgb_palette.py; the reference
# scene is near-grayscale: default gray background/terrain material and the
# dark basketball texture). Values overwritten by the round-5 fit.
_RGB_PALETTE = {
    "terrain": (0.430, 0.430, 0.430),
    "ball": (0.208, 0.131, 0.093),
    "sky": (0.433, 0.433, 0.433),
    "ambient": 0.709,
}

# cache of constant patch->polar resample matrices, keyed by geometry
_POLAR_W_CACHE: dict = {}


def _polar_resample_matrix(cell: float, t_max: float, P: int):
    """Constant (NTH*NS, P*P) bilinear resample matrix in bfloat16.

    Maps a camera-centered (P, P) terrain patch (camera snapped to the
    lattice cell (P//2, P//2)) onto the fixed polar sample grid. Because the
    polar offsets are fixed in WORLD axes and the patch is lattice-aligned,
    the tent weights are the same for every env — one constant matrix that
    the MXU streams once per batched render, instead of materializing
    per-env (M, P) weight operands in HBM (which made the einsum
    formulation bandwidth-bound: ~7 GB per 512-env render).
    """
    key = (round(cell, 9), round(t_max, 9), P)
    if key not in _POLAR_W_CACHE:
        phis = np.arange(_NTH) * (2.0 * np.pi / _NTH)
        radii = np.linspace(0.02, t_max, _NS)
        gx = P // 2 + (radii[None, :] * np.cos(phis)[:, None]).reshape(-1) / cell
        gy = P // 2 + (radii[None, :] * np.sin(phis)[:, None]).reshape(-1) / cell
        gx = np.clip(gx, 0.0, P - 1.001)
        gy = np.clip(gy, 0.0, P - 1.001)
        c0 = np.floor(gx).astype(np.int64)
        r0 = np.floor(gy).astype(np.int64)
        fc = (gx - c0).astype(np.float32)
        fr = (gy - r0).astype(np.float32)
        M = gx.shape[0]
        W = np.zeros((M, P * P), np.float32)
        rows = np.arange(M)
        np.add.at(W, (rows, r0 * P + c0), (1 - fr) * (1 - fc))
        np.add.at(W, (rows, r0 * P + c0 + 1), (1 - fr) * fc)
        np.add.at(W, (rows, (r0 + 1) * P + c0), fr * (1 - fc))
        np.add.at(W, (rows, (r0 + 1) * P + c0 + 1), fr * fc)
        import jax as _jax
        import jax.numpy as _jnp
        # the first call may happen inside a trace (first jit of a render):
        # force eager creation so the cache holds a concrete array, never a
        # tracer (VisionBallbotEnv.__init__ also pre-warms this cache)
        with _jax.ensure_compile_time_eval():
            _POLAR_W_CACHE[key] = _jnp.asarray(W, _jnp.bfloat16)
    return _POLAR_W_CACHE[key]


def _ray_profile_crossing(cz, m, eps, h_ray, radii):
    """First crossing of ray z(s) = cz + m*(s - eps) with the piecewise-
    linear height profile h(s) sampled at `radii`. h_ray: (..., NS), any
    float dtype (bf16 upcast in the fused expression). Returns
    (hit_any, s_star) with s_star = 0 where the ray starts at/below the
    profile (masked 0 where it never crosses).

    Performance shape (round-5 revision, from the fixed profile_render
    trace at B=1024): the first down-crossing is the masked MIN of
    per-segment closed-form crossing points (later crossings have larger s
    by construction), so no cummax/first-true machinery is needed —
    lax.cummax lowers to a log-depth associative scan that re-materializes
    the (HW, NS) working set ~6x in HBM and dominated the batched render
    (7.9 of 15 ms at B=512). Two further rules keep the pass
    bandwidth-minimal:
      * ga/gb are computed from h_ray SLICES independently — forming the
        full g = ray - h_ray array first makes XLA MATERIALIZE it in f32
        (2x the bf16 h_ray) and read it back for the reduction: 8.0 of
        17.7 ms per B=1024 render. Recomputing the ray term per slice is
        ~free VPU work; the arithmetic (and thus the output) is bit-
        identical.
      * leading dims are NOT flattened: callers pass (..., NS) shapes
        as-is. The old (B, 2, HW, NS) -> (B, 2*HW, NS) reshape forced a
        2.6 ms layout copy of h_ray between the tent einsum and this pass.
    Never concatenate segments (a concat materializes a second copy and
    breaks XLA fusion).
    """
    cz = jnp.broadcast_to(jnp.asarray(cz, m.dtype), m.shape)   # per-ray ok
    # identical association to the old fused g = cz + m*(r - eps) - h, so
    # outputs are bitwise unchanged; only the fusion structure differs
    czb, mb, eb = cz[..., None], m[..., None], eps[..., None]
    ga = czb + mb * (radii[None, :-1] - eb) \
        - h_ray[..., :-1].astype(jnp.float32)
    gb = czb + mb * (radii[None, 1:] - eb) \
        - h_ray[..., 1:].astype(jnp.float32)
    cross = (ga > 0.0) & (gb <= 0.0)
    denom = ga - gb                                 # > 0 wherever cross
    frac = jnp.clip(ga / jnp.where(denom > 1e-9, denom, 1.0), 0.0, 1.0)
    s_cross = radii[:-1] + (radii[1:] - radii[:-1]) * frac
    s_min = jnp.min(jnp.where(cross, s_cross, jnp.inf), axis=-1)
    # virtual segment from s=0 with h held at h(radii[0])
    h0 = h_ray[..., 0].astype(jnp.float32)
    g0 = cz + m * (radii[0] - eps) - h0
    gp0 = cz - m * eps - h0
    d0 = gp0 - g0
    f0 = jnp.clip(gp0 / jnp.where(d0 > 1e-9, d0, 1.0), 0.0, 1.0)
    s0 = jnp.where((gp0 > 0.0) & (g0 <= 0.0), radii[0] * f0, jnp.inf)
    s_star = jnp.minimum(s_min, s0)
    below = (gp0 <= 0.0) & (g0 <= 0.0)
    hit_any = below | jnp.isfinite(s_star)
    s_star = jnp.where(below, 0.0, jnp.where(hit_any, s_star, 0.0))
    return hit_any, s_star


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
    coarse_steps: int = 44      # fixed march resolution (~4 cm over t_max)
    refine_steps: int = 6       # bisection iterations
    # march horizon: corner rays at fovy 90 need t up to max_depth/cos(54.7
    # deg) = 1.73 before their AXIAL depth reaches the 1 m clip
    t_max: float = 1.75
    # TPU fast path: march against a per-env local terrain patch sampled via
    # one-hot einsum (MXU matmuls) instead of per-pixel gathers. TPU gathers
    # run at ~78M elements/s; a 64x64x2 render needs ~1.5M taps (4 gathers
    # each), so the exact path costs ~19 ms/env — unusable batched. The fast
    # path's only gather is the patch extraction (patch_n^2 taps per env per
    # render); everything per-pixel is dense math.
    use_patch: bool = True
    patch_n: int = 118          # patch cells; covers +-(t_max + cam offset)
                                # at the native 3.4 cm cell size


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

    # ---- exact-path tracing primitives (shared by depth and RGBD) ----
    def _trace_ball(self, origin, dirs_w, ball_pos):
        """Analytic ray-sphere: t along each ray, inf on miss."""
        cfg = self.cfg
        oc = origin - ball_pos
        b = jnp.einsum("...i,i->...", dirs_w, oc)
        c = jnp.dot(oc, oc) - self.ball_radius ** 2
        disc = b * b - c
        t_ball = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        return jnp.where((disc > 0) & (t_ball > cfg.znear), t_ball, jnp.inf)

    def _trace_terrain(self, sampler, origin, dirs_w):
        """Coarse march + bisection refine: (hit_any, t_terr[inf on miss]).

        The march runs as a scan over the ray parameter so memory stays
        (H, W) per env regardless of coarse_steps — a batched
        materialization is (B, steps, H, W, 3) and OOMs at scale.
        """
        cfg = self.cfg
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
        return hit_any, jnp.where(hit_any, 0.5 * (t_lo + t_hi), jnp.inf)

    def _cam_rays(self, cam_idx, base_pos, R):
        origin = base_pos + R @ self._cam_pos[cam_idx]
        Rcw = R @ self._cam_rot[cam_idx]                     # cam -> world
        dirs_w = jnp.einsum("ij,hwj->hwi", Rcw, self._dirs)  # (H,W,3)
        return origin, dirs_w

    def __call__(self, sampler: Callable, base_pos, base_quat, ball_pos):
        cfg = self.cfg
        R = quat_to_mat(base_quat)

        def render_cam(cam_idx):
            origin, dirs_w = self._cam_rays(cam_idx, base_pos, R)
            t_ball = self._trace_ball(origin, dirs_w, ball_pos)
            _, t_terr = self._trace_terrain(sampler, origin, dirs_w)
            t_hit = jnp.minimum(t_ball, t_terr)
            depth = t_hit * self._axial                      # z-buffer depth
            return jnp.clip(depth, 0.0, cfg.max_depth)

        return jnp.stack([render_cam(0), render_cam(1)])

    def render_rgbd(self, sampler: Callable, base_pos, base_quat, ball_pos,
                    palette: Optional[dict] = None):
        """Full RGBD obs: (2, 4, H, W) with channels [R, G, B, depth].

        Counterpart of the reference's RGB+depth camera mode
        (depth_only=False, ballbot_env.py:123; rgbd.py:45-83 renders RGB via
        OpenGL and stacks the depth channel). RGB is raycast against
        {terrain, ball} with HEADLIGHT Lambert shading (light from the
        camera — MuJoCo's default scene light) and a palette CALIBRATED
        per-class against the reference's real OpenGL renders
        (tools/cross_renderer_rgb.py / fit_rgb_palette.py: the reference
        scene is near-grayscale — gray terrain and background, dark
        textured basketball). Exact marcher only (the patch fast path
        produces no hit points); the depth channel matches __call__
        exactly. This is a compatibility path: the paper's input and every
        training config use depth-only.

        palette: override dict with keys terrain/ball/sky (RGB triples)
        and ambient (float) — defaults to the calibrated _RGB_PALETTE.
        """
        cfg = self.cfg
        R = quat_to_mat(base_quat)
        pal = dict(_RGB_PALETTE)
        if palette:
            pal.update(palette)
        col_terrain = jnp.asarray(pal["terrain"], jnp.float32)
        col_ball = jnp.asarray(pal["ball"], jnp.float32)
        col_sky = jnp.asarray(pal["sky"], jnp.float32)
        ambient = float(pal["ambient"])

        def render_cam(cam_idx):
            origin, dirs_w = self._cam_rays(cam_idx, base_pos, R)
            t_ball = self._trace_ball(origin, dirs_w, ball_pos)
            hit_terr, t_terr = self._trace_terrain(sampler, origin, dirs_w)
            t_hit = jnp.minimum(t_ball, t_terr)
            depth = jnp.clip(t_hit * self._axial, 0.0, cfg.max_depth)

            ball_front = t_ball < t_terr
            hit_any = ball_front | hit_terr
            t_safe = jnp.where(jnp.isfinite(t_hit), t_hit, cfg.t_max)
            p = origin[None, None, :] + t_safe[..., None] * dirs_w

            # normals: terrain from the sampler's analytic gradient, ball
            # from the sphere center
            _, gx, gy = sampler(p[..., 0], p[..., 1])
            n_terr = jnp.stack([-gx, -gy, jnp.ones_like(gx)], axis=-1)
            n_terr = n_terr / jnp.linalg.norm(n_terr, axis=-1, keepdims=True)
            n_ball = (p - ball_pos) / self.ball_radius
            n = jnp.where(ball_front[..., None], n_ball, n_terr)

            # headlight: light travels along the ray, surfaces facing the
            # camera are lit — cos = n . (-ray_dir)
            lambert = ambient + (1.0 - ambient) * jnp.maximum(
                0.0, -jnp.einsum("hwi,hwi->hw", n, dirs_w))
            base_col = jnp.where(ball_front[..., None], col_ball, col_terrain)
            rgb = jnp.where(hit_any[..., None], base_col * lambert[..., None],
                            col_sky)
            rgb = jnp.clip(rgb, 0.0, 1.0)
            return jnp.concatenate(
                [jnp.moveaxis(rgb, -1, 0), depth[None]], axis=0)  # (4, H, W)

        return jnp.stack([render_cam(0), render_cam(1)])

    # ------------------------------------------------------------------
    # TPU fast path: patch + polar profiles, constant-weight matmul (MXU)
    # ------------------------------------------------------------------
    def _stacked_rays(self, base_pos, base_quat):
        """Both cameras' origins and world-frame rays, stacked on a leading
        axis of 2 (half the kernel count of a per-camera python loop)."""
        R = quat_to_mat(base_quat)
        origins = base_pos[None, :] + jnp.einsum(
            "ij,cj->ci", R, self._cam_pos)                    # (2, 3)
        Rcw = jnp.einsum("ij,cjk->cik", R, self._cam_rot)     # (2, 3, 3)
        dirs_w = jnp.einsum("cij,hwj->chwi", Rcw, self._dirs)
        H, W = dirs_w.shape[1:3]
        return origins, dirs_w.reshape(2, -1, 3), H, W        # d: (2, HW, 3)

    def _stacked_ball(self, origins, d, ball_pos):
        """Analytic ray-sphere over both cameras: t (2, HW), inf on miss."""
        cfg = self.cfg
        oc = origins - ball_pos                               # (2, 3)
        b = jnp.einsum("cri,ci->cr", d, oc)
        c = jnp.sum(oc * oc, axis=-1)[:, None] - self.ball_radius ** 2
        disc = b * b - c
        t_ball = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        return jnp.where((disc > 0) & (t_ball > cfg.znear), t_ball, jnp.inf)

    def _profile_depth(self, origins, d, t_ball, h_polar, dx, dy, H, W):
        """Depth image from per-camera polar terrain profiles: circular
        theta tent -> per-ray radial profile -> closed-form first crossing
        (_ray_profile_crossing) -> min with the ball, axial clip."""
        cfg = self.cfg
        radii = jnp.linspace(0.02, cfg.t_max, _NS)
        HW = d.shape[1]

        # --- per-ray height profile via circular tent over theta ---
        dxy = jnp.maximum(jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2), 1e-4)
        theta = jnp.arctan2(d[..., 1], d[..., 0])             # (-pi, pi]
        tcoord = (theta % (2.0 * jnp.pi)) / (2.0 * jnp.pi) * _NTH
        dist = jnp.abs(tcoord[..., None] - jnp.arange(_NTH)[None, None, :])
        dist = jnp.minimum(dist, _NTH - dist)                 # circular
        wth = jnp.maximum(0.0, 1.0 - dist).astype(jnp.bfloat16)
        # h_ray stays bf16: each profile mixes <=2 polar bins (tent), so
        # the MXU's f32 accumulation loses nothing downcasting, and bf16
        # halves the dominant HBM term of the crossing pass (~1 mm
        # quantization on <=0.6 m heights, under the path's tolerance)
        h_ray = jnp.einsum("crn,cnk->crk", wth,
                           h_polar.astype(jnp.bfloat16),
                           preferred_element_type=jnp.bfloat16)

        # --- first crossing: exact per-segment closed form via one masked
        # min-reduction (_ray_profile_crossing), fully dense (TPU gathers
        # run ~78M elem/s; argmax + take_along_axis here cost >100 ms per
        # batched render). Keep the (2, HW, NS) shape — flattening cams
        # into the ray axis forced a ~2.6 ms h_ray layout copy per B=1024
        # render (round-5 profile_render trace).
        m = d[..., 2] / dxy                                   # (2, HW)
        eps = (d[..., 0] * dx[:, None] + d[..., 1] * dy[:, None]) / dxy
        czv = jnp.broadcast_to(origins[:, 2][:, None], m.shape)
        hit_any, s_star = _ray_profile_crossing(czv, m, eps, h_ray, radii)
        t_terr = jnp.where(hit_any, (s_star - eps) / dxy, jnp.inf)

        t_hit = jnp.minimum(t_ball, jnp.maximum(t_terr, cfg.znear))
        depth = t_hit * self._axial.reshape(-1)[None, :]
        return jnp.clip(depth, 0.0, cfg.max_depth).reshape(2, H, W)

    def render_patch(self, heights, idx, half_extent, zscale,
                     base_pos, base_quat, ball_pos):
        """Gather-free terrain rendering against a local patch.

        heights: (K, n, n) terrain bank; idx: scalar bank index. The ONLY
        gather is one contiguous dynamic_slice per camera (the patch). The
        terrain is resampled onto a fixed polar grid centered at the
        camera's ground point SNAPPED to the terrain lattice, so the
        bilinear resample is one matmul against a constant (M, P^2) weight
        matrix shared by all envs (see _polar_resample_matrix) — the MXU
        streams the constant once per batched render instead of writing
        per-env (M, P) tent operands to HBM. The sub-cell snap offset is
        folded into each ray as a radial shift eps = u . (true - snapped)
        (first-order exact; |eps| <= 0.7 cell = 2.4 cm, below the polar
        grid's own angular footprint). Each ray then intersects its
        piecewise-linear radial profile in closed form:

            ray height  z(s) = cz + m*(s - eps)   (s = snapped horiz dist)
            hit where   z(s) <= h(s)

        Accuracy vs the exact marcher: polar resolution ~3.75 deg x 3.7 cm
        — comparable to the camera's own pixel footprint; silhouette pixels
        can land one sample off (verified within tolerance by
        tests/unit/test_sensors.py, which also pins this path against the
        reference einsum formulation, kept as render_patch_einsum).
        """
        cfg = self.cfg
        n = heights.shape[-1]
        P = cfg.patch_n
        assert P <= n, (
            f"patch_n ({P}) exceeds the terrain grid ({n}); shrink "
            f"DepthCameraConfig.patch_n or use a larger heightfield")
        cell = 2.0 * half_extent / (n - 1)
        Wmat = _polar_resample_matrix(cell, cfg.t_max, P)

        origins, d, H, W = self._stacked_rays(base_pos, base_quat)
        t_ball = self._stacked_ball(origins, d, ball_pos)

        # --- camera-centered patches, snapped to the lattice ---
        crow = jnp.round((origins[:, 1] + half_extent) / cell) \
            .astype(jnp.int32)                                # (2,)
        ccol = jnp.round((origins[:, 0] + half_extent) / cell) \
            .astype(jnp.int32)
        ri = jnp.clip(crow - P // 2, 0, n - P)
        cj = jnp.clip(ccol - P // 2, 0, n - P)
        patches = jnp.stack([
            jax.lax.dynamic_slice(heights, (idx, ri[k], cj[k]),
                                  (1, P, P))[0]
            for k in range(2)]) * zscale                      # (2, P, P)
        # Edge-replicating recentre: W assumes the camera at patch cell
        # (P//2, P//2), but near the world border the slice clamps and the
        # camera lands off-center (up to ~2 m — far beyond the first-order
        # eps correction's validity). Remap virtual camera-centered rows
        # v -> world rows clip(crow - P//2 + v, 0, n-1) with one-hot
        # selection matmuls: identity (bit-exact no-op) in the interior,
        # clamp-to-edge at the border — the same semantics the exact
        # marcher gets from the sampler's query clamp.
        v = jnp.arange(P, dtype=jnp.int32)
        lr = jnp.clip(crow[:, None] - P // 2 + v[None, :], 0, n - 1) \
            - ri[:, None]                                     # (2, P)
        lc = jnp.clip(ccol[:, None] - P // 2 + v[None, :], 0, n - 1) \
            - cj[:, None]
        Rr = (lr[:, :, None] == v[None, None, :]).astype(jnp.bfloat16)
        Rc = (lc[:, :, None] == v[None, None, :]).astype(jnp.bfloat16)
        pc = jnp.einsum("cvr,crk,cwk->cvw", Rr,
                        patches.astype(jnp.bfloat16), Rc)     # (2, P, P)
        h_polar = jnp.einsum("mk,ck->cm", Wmat, pc.reshape(2, -1),
                             preferred_element_type=jnp.float32)
        h_polar = h_polar.reshape(2, _NTH, _NS)
        # sub-cell snap offsets (world meters; <= 0.7 cell by construction)
        dx = origins[:, 0] - (ccol * cell - half_extent)      # (2,)
        dy = origins[:, 1] - (crow * cell - half_extent)

        return self._profile_depth(origins, d, t_ball, h_polar, dx, dy, H, W)

    def render_tiles(self, cam_tiles, idx, tiles_T, n, half_extent, zscale,
                     base_pos, base_quat, ball_pos):
        """render_patch against a pre-sliced aligned camera-tile bank.

        cam_tiles: (K*T*T, Pc*Pc) bf16 RAW heights in [0, 1]
        (hfield.make_tiles with CAM_TILE_SIZE/CAM_TILE_STRIDE); tiles_T:
        static tiles-per-dim. Replaces render_patch's two per-env
        (1, P, P) dynamic_slices — which XLA lowers to a SERIAL per-env
        loop under vmap, the same shape that cost the physics path 65.7 ms
        (physics/hfield.py module doc) — with one embedding-style row
        gather per camera. The recentring one-hot matmuls then select the
        patch_n window out of the tile exactly as render_patch selects it
        out of the full grid (identical world rows, clamp-to-edge at the
        border via the tile's own edge padding), so everything downstream
        of `pc` is the shared _profile_depth path. Bit-parity with
        render_patch: exact when zscale is a power of two (bf16 scaling
        commutes), <=1 ulp(bf16) otherwise (tests/unit/test_sensors.py).
        """
        from openballbot_rl_tpu.physics import hfield as hf

        cfg = self.cfg
        P = cfg.patch_n
        Pc = hf.CAM_TILE_SIZE
        # containment preconditions (ADVICE r4): the tile must cover the
        # recentred patch window for any camera within S/2 of its center
        # (performance.md proof: Pc >= P + 1 + S); without this, rows near
        # tile boundaries silently clamp to the tile edge and depths there
        # are wrong. Mirror render_patch's loud patch_n <= n failure too.
        assert P + 1 + hf.CAM_TILE_STRIDE <= Pc, (
            f"patch_n ({P}) breaks camera-tile containment: need patch_n + 1"
            f" + CAM_TILE_STRIDE ({hf.CAM_TILE_STRIDE}) <= CAM_TILE_SIZE "
            f"({Pc}); shrink patch_n or enlarge the camera tiles")
        assert P <= n, (
            f"patch_n ({P}) exceeds the terrain grid ({n}); shrink "
            f"DepthCameraConfig.patch_n or use a larger heightfield")
        cell = 2.0 * half_extent / (n - 1)
        Wmat = _polar_resample_matrix(cell, cfg.t_max, P)

        origins, d, H, W = self._stacked_rays(base_pos, base_quat)
        t_ball = self._stacked_ball(origins, d, ball_pos)

        crow = jnp.round((origins[:, 1] + half_extent) / cell) \
            .astype(jnp.int32)                                # (2,)
        ccol = jnp.round((origins[:, 0] + half_extent) / cell) \
            .astype(jnp.int32)
        flat, a0, b0 = hf.cam_tile_select(idx, crow, ccol, tiles_T)
        tiles = jnp.take(cam_tiles, flat, axis=0).reshape(2, Pc, Pc)

        # recentre out of the tile: same world rows as render_patch, tile
        # origin replacing the slice origin (cam_tile_select guarantees
        # containment under the asserted Pc >= P + 1 + S precondition; the
        # outer clip is a proven no-op kept as a guard — if containment DID
        # break, it would clamp out-of-tile rows to the tile's edge row,
        # i.e. silently wrong depths, which is why the precondition asserts
        # loudly above)
        v = jnp.arange(P, dtype=jnp.int32)
        vc = jnp.arange(Pc, dtype=jnp.int32)
        lr = jnp.clip(jnp.clip(crow[:, None] - P // 2 + v[None, :], 0, n - 1)
                      - a0[:, None], 0, Pc - 1)               # (2, P)
        lc = jnp.clip(jnp.clip(ccol[:, None] - P // 2 + v[None, :], 0, n - 1)
                      - b0[:, None], 0, Pc - 1)
        Rr = (lr[:, :, None] == vc[None, None, :]).astype(jnp.bfloat16)
        Rc = (lc[:, :, None] == vc[None, None, :]).astype(jnp.bfloat16)
        pc = jnp.einsum("cvr,crk,cwk->cvw", Rr, tiles, Rc)    # (2, P, P) bf16
        # raw [0,1] heights through the constant resample; zscale applied in
        # f32 AFTER (linearity) — bitwise-commutes when zscale is 2^k
        h_polar = jnp.einsum("mk,ck->cm", Wmat, pc.reshape(2, -1),
                             preferred_element_type=jnp.float32) * zscale
        h_polar = h_polar.reshape(2, _NTH, _NS)
        dx = origins[:, 0] - (ccol * cell - half_extent)      # (2,)
        dy = origins[:, 1] - (crow * cell - half_extent)

        return self._profile_depth(origins, d, t_ball, h_polar, dx, dy, H, W)

    def render_patch_einsum(self, heights, idx, half_extent, zscale,
                            base_pos, base_quat, ball_pos):
        """Reference formulation of the patch fast path (per-env tent-weight
        einsum, exact bilinear at the true camera point). Kept for A/B
        validation of render_patch; bandwidth-bound on TPU (the (M, P)
        weight operands are materialized per env per camera).
        """
        cfg = self.cfg
        n = heights.shape[-1]
        P = cfg.patch_n
        assert P <= n, (
            f"patch_n ({P}) exceeds the terrain grid ({n}); shrink "
            f"DepthCameraConfig.patch_n or use a larger heightfield")
        NTH, NS = 96, 48
        cell = 2.0 * half_extent / (n - 1)

        # --- one contiguous patch slice around the base ---
        ci = jnp.clip(jnp.round((base_pos[1] + half_extent) / cell)
                      .astype(jnp.int32) - P // 2, 0, n - P)
        cj = jnp.clip(jnp.round((base_pos[0] + half_extent) / cell)
                      .astype(jnp.int32) - P // 2, 0, n - P)
        patch = jax.lax.dynamic_slice(
            heights, (idx, ci, cj), (1, P, P))[0] * zscale    # (P, P) meters

        R = quat_to_mat(base_quat)
        rows_idx = jnp.arange(P, dtype=jnp.float32)

        def tent(x, size):
            """Exact bilinear weights: (M,) coords -> (M, size)."""
            d = jnp.abs(x[:, None] - jnp.arange(size, dtype=jnp.float32)[None, :])
            return jnp.maximum(0.0, 1.0 - d)

        def render_cam(cam_idx):
            origin = base_pos + R @ self._cam_pos[cam_idx]
            Rcw = R @ self._cam_rot[cam_idx]
            dirs_w = jnp.einsum("ij,hwj->hwi", Rcw, self._dirs)
            H, W = dirs_w.shape[:2]
            d = dirs_w.reshape(-1, 3)                         # (HW, 3)
            cz = origin[2]

            # --- ball: analytic ray-sphere (shared with the exact path) ---
            oc = origin - ball_pos
            b = d @ oc
            c = jnp.dot(oc, oc) - self.ball_radius ** 2
            disc = b * b - c
            t_ball = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
            t_ball = jnp.where((disc > 0) & (t_ball > cfg.znear), t_ball,
                               jnp.inf)

            # --- polar terrain profiles around the camera ground point ---
            phis = jnp.arange(NTH) * (2.0 * jnp.pi / NTH)
            radii = jnp.linspace(0.02, cfg.t_max, NS)
            px = origin[0] + radii[None, :] * jnp.cos(phis)[:, None]
            py = origin[1] + radii[None, :] * jnp.sin(phis)[:, None]
            gr = ((py.reshape(-1) + half_extent) / cell
                  - ci.astype(jnp.float32))
            gc = ((px.reshape(-1) + half_extent) / cell
                  - cj.astype(jnp.float32))
            gr = jnp.clip(gr, 0.0, P - 1.0)
            gc = jnp.clip(gc, 0.0, P - 1.0)
            wr = tent(gr, P)                                  # (M, P)
            wc = tent(gc, P)
            h_polar = jnp.einsum("mr,rc,mc->m", wr, patch, wc,
                                 preferred_element_type=jnp.float32)
            h_polar = h_polar.reshape(NTH, NS)

            # --- per-ray height profile via circular tent over theta ---
            dxy = jnp.maximum(jnp.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2), 1e-4)
            theta = jnp.arctan2(d[:, 1], d[:, 0])             # (-pi, pi]
            tcoord = (theta % (2.0 * jnp.pi)) / (2.0 * jnp.pi) * NTH
            dist = jnp.abs(tcoord[:, None] - jnp.arange(NTH)[None, :])
            dist = jnp.minimum(dist, NTH - dist)              # circular
            wth = jnp.maximum(0.0, 1.0 - dist)                # (HW, NTH)
            h_ray = wth @ h_polar                             # (HW, NS)

            # --- first crossing of ray_z(s) = cz + m*s with the piecewise-
            # linear height profile h(s): exact per-segment closed form,
            # fully dense (TPU gathers run ~78M elem/s; argmax +
            # take_along_axis here cost >100 ms per batched render)
            m = d[:, 2] / dxy
            hit_any, s_star = _ray_profile_crossing(
                cz, m, jnp.zeros_like(m), h_ray, radii)
            t_terr = jnp.where(hit_any, s_star / dxy, jnp.inf)

            t_hit = jnp.minimum(t_ball, jnp.maximum(t_terr, cfg.znear))
            depth = t_hit * self._axial.reshape(-1)
            return jnp.clip(depth, 0.0, cfg.max_depth).reshape(H, W)

        return jnp.stack([render_cam(0), render_cam(1)])
