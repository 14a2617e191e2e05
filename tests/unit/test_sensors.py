"""Depth-camera raycaster tests (sensors/depth.py).

Geometry oracles are analytic: flat terrain at z=0, known camera pose ->
closed-form ray-plane / ray-sphere depths. Mirrors the semantics the
reference gets from its OpenGL z-buffer (ballbot_gym/sensors/rgbd.py:45-82):
axial (z-buffer) depth in meters, clipped to [0, 1].
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openballbot_rl_tpu.physics import hfield as hf
from openballbot_rl_tpu.sensors.depth import (
    CAM_POS_B, CAM_ROT_B, DepthCameraConfig, DepthCameras)


@pytest.fixture(scope="module")
def flat_sampler():
    return hf.make_sampler(jnp.zeros((293, 293)), None, 5.0, 2.0)


@pytest.fixture(scope="module")
def cams():
    return DepthCameras()


def _render(cams, sampler, base_pos, ball_pos=(0.0, 0.0, -10.0)):
    return np.asarray(cams(
        sampler,
        jnp.asarray(base_pos, jnp.float32),
        jnp.array([1.0, 0, 0, 0], jnp.float32),
        jnp.asarray(ball_pos, jnp.float32)))


class TestDepthCameras:
    def test_shape_and_range(self, cams, flat_sampler):
        d = _render(cams, flat_sampler, [0, 0, 0.4], [0, 0, 0.09])
        assert d.shape == (2, 64, 64)
        assert d.min() >= 0.0 and d.max() <= 1.0

    def test_flat_ground_analytic_depth(self, cams, flat_sampler):
        """Center-ish pixel depth matches the closed-form ray-plane hit."""
        d = _render(cams, flat_sampler, [0, 0, 0.4])  # ball far away
        # reconstruct the exact ray for a probe pixel and intersect z=0
        H = W = 64
        i, j = 40, 32
        half = 1.0
        u = (2.0 * (j + 0.5) / W - 1.0) * half
        v = (1.0 - 2.0 * (i + 0.5) / H) * half
        dir_cam = np.array([u, v, -1.0])
        dir_cam /= np.linalg.norm(dir_cam)
        R = np.asarray(CAM_ROT_B[0])
        origin = np.array([0, 0, 0.4]) + np.asarray(CAM_POS_B[0])
        dir_w = R @ dir_cam
        t_hit = -origin[2] / dir_w[2]
        expected = min(t_hit * abs(dir_cam[2]), 1.0)
        assert abs(float(d[0, i, j]) - expected) < 5e-3

    def test_ball_occludes_terrain(self, cams, flat_sampler):
        with_ball = _render(cams, flat_sampler, [0, 0, 0.4], [0, 0, 0.09])
        without = _render(cams, flat_sampler, [0, 0, 0.4])
        # the ball is strictly closer than the ground wherever it covers
        covered = with_ball < without - 1e-3
        assert covered.any()
        # and the closest ball pixel is roughly at distance |cam->ball|-r
        cam_w = np.array([0, 0, 0.4]) + np.asarray(CAM_POS_B[0])
        dist = np.linalg.norm(np.array([0, 0, 0.09]) - cam_w) - 0.09
        assert with_ball[0].min() < dist + 0.05

    def test_miss_is_max_depth(self, cams, flat_sampler):
        """Looking from high up, everything beyond 1 m clips to 1.0."""
        d = _render(cams, flat_sampler, [0, 0, 3.0])
        assert float(d.min()) == pytest.approx(1.0)

    def test_terrain_bump_appears(self, cams):
        terr = np.zeros((293, 293), np.float32)
        # a tall square bump ~0.5 m in front of the robot (+x side, cam_0)
        gx = int((0.5 + 5.0) / 10.0 * 292)
        terr[140:152, gx - 6:gx + 6] = 0.15  # 0.3 m tall at zscale=2
        bump = hf.make_sampler(jnp.asarray(terr), None, 5.0, 2.0)
        flat = hf.make_sampler(jnp.zeros((293, 293)), None, 5.0, 2.0)
        d_bump = _render(cams, bump, [0, 0, 0.4])
        d_flat = _render(cams, flat, [0, 0, 0.4])
        assert (d_bump[0] < d_flat[0] - 5e-3).any()

    def test_vmap_batches(self, cams, flat_sampler):
        B = 4
        poses = jnp.tile(jnp.array([0.0, 0, 0.4]), (B, 1))
        quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (B, 1))
        balls = jnp.tile(jnp.array([0.0, 0, 0.09]), (B, 1))
        out = jax.vmap(lambda p, q, b: cams(flat_sampler, p, q, b))(
            poses, quats, balls)
        assert out.shape == (B, 2, 64, 64)
        np.testing.assert_allclose(out[0], out[1], rtol=1e-6)

    def test_custom_resolution(self, flat_sampler):
        small = DepthCameras(DepthCameraConfig(height=16, width=16))
        d = _render(small, flat_sampler, [0, 0, 0.4])
        assert d.shape == (2, 16, 16)


class TestPatchRenderer:
    """TPU fast path (render_patch): gather-free polar/einsum rendering must
    track the exact marcher within silhouette tolerance."""

    def test_matches_exact_marcher(self, cams):
        import numpy as np

        from openballbot_rl_tpu.core.factories import create_terrain

        gen = create_terrain({"type": "perlin",
                              "config": {"scale": 25.0, "octaves": 4,
                                         "persistence": 0.2,
                                         "lacunarity": 2.0}})
        hts = jnp.asarray(gen(293, seed=3), jnp.float32).reshape(1, 293, 293)
        off = float(hf.spawn_height_offset(hts[0], 2.0))
        full = DepthCameras()          # 64x64 (module fixture is 16x16-free)
        bp = jnp.array([0.3, -0.2, 0.35 + off], jnp.float32)
        q = jnp.array([0.9961947, 0.0871557, 0.0, 0.0], jnp.float32)  # 10 deg
        ball = bp + jnp.array([0.0, 0.0, -0.25], jnp.float32)
        sam = hf.make_sampler(hts, jnp.asarray(0), 5.0, 2.0)
        exact = np.asarray(full(sam, bp, q, ball))
        fast = np.asarray(full.render_patch(hts, jnp.asarray(0), 5.0, 2.0,
                                            bp, q, ball))
        d = np.abs(exact - fast)
        assert d.mean() < 0.02, f"mean abs depth error {d.mean():.4f}"
        assert np.quantile(d, 0.95) < 0.05, \
            f"p95 depth error {np.quantile(d, 0.95):.4f}"

    def test_flat_ground_analytic(self, flat_sampler):
        """On flat terrain the patch path must match the closed-form depth."""
        import numpy as np

        full = DepthCameras()
        hts = jnp.zeros((1, 293, 293), jnp.float32)
        bp = jnp.array([0.0, 0.0, 0.4], jnp.float32)
        q = jnp.array([1.0, 0, 0, 0], jnp.float32)
        fast = np.asarray(full.render_patch(hts, jnp.asarray(0), 5.0, 2.0,
                                            bp, q,
                                            jnp.array([0.0, 0.0, -9.0])))
        exact = np.asarray(full(flat_sampler, bp, q,
                                jnp.array([0.0, 0.0, -9.0])))
        d = np.abs(exact - fast)
        assert np.quantile(d, 0.99) < 0.02, \
            f"flat-ground p99 error {np.quantile(d, 0.99):.4f}"

    def test_vmap_batches(self):
        full = DepthCameras(DepthCameraConfig(height=16, width=16))
        hts = jnp.zeros((2, 293, 293), jnp.float32)
        B = 3
        out = jax.vmap(lambda p: full.render_patch(
            hts, jnp.asarray(0), 5.0, 2.0, p,
            jnp.array([1.0, 0, 0, 0]), p - jnp.array([0.0, 0, 0.2])))(
            jnp.tile(jnp.array([0.0, 0, 0.4]), (B, 1)))
        assert out.shape == (B, 2, 16, 16)


class TestRGBD:
    """RGB+depth compat mode (render_rgbd; reference depth_only=False,
    ballbot_env.py:123 + rgbd.py:45-83)."""

    def _rgbd(self, cams, sampler, base_pos, ball_pos=(0.0, 0.0, -10.0)):
        return np.asarray(cams.render_rgbd(
            sampler,
            jnp.asarray(base_pos, jnp.float32),
            jnp.array([1.0, 0, 0, 0], jnp.float32),
            jnp.asarray(ball_pos, jnp.float32)))

    def test_shape_and_range(self, cams, flat_sampler):
        out = self._rgbd(cams, flat_sampler, (0.0, 0.0, 0.4))
        assert out.shape == (2, 4, 64, 64)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_depth_channel_matches_depth_path(self, cams, flat_sampler):
        pos, ball = (0.0, 0.0, 0.4), (0.05, 0.0, 0.09)
        depth = _render(cams, flat_sampler, pos, ball)
        rgbd = self._rgbd(cams, flat_sampler, pos, ball)
        np.testing.assert_allclose(rgbd[:, 3], depth, atol=1e-6)

    def test_sky_pixels_are_sky(self, cams, flat_sampler):
        # camera high above the ground: every ray's march exhausts t_max
        # before reaching terrain -> all pixels miss -> exact sky color
        # (the reference-calibrated _RGB_PALETTE) and depth at the clip
        from openballbot_rl_tpu.sensors.depth import _RGB_PALETTE

        out = self._rgbd(cams, flat_sampler, (0.0, 0.0, 3.0))
        for c in range(3):
            np.testing.assert_allclose(out[:, c], _RGB_PALETTE["sky"][c],
                                       atol=1e-6)
        np.testing.assert_allclose(out[:, 3], 1.0, atol=1e-6)

    def test_ball_pixels_are_ball_colored(self, cams, flat_sampler):
        # ball dead ahead below the cameras: ball pixels take the warm dark
        # basketball tone (red > green > blue — calibrated _RGB_PALETTE);
        # terrain pixels are neutral gray (r == g == b)
        out = self._rgbd(cams, flat_sampler, (0.0, 0.0, 0.4),
                         (0.0, 0.15, 0.09))
        hit = out[0, 3] < 1.0 - 1e-6
        assert hit.any()
        r, g, b = out[0, 0][hit], out[0, 1][hit], out[0, 2][hit]
        ball = r > b + 1e-6                     # warm pixels = the ball
        assert ball.any()
        assert (r[ball] > g[ball]).all() and (g[ball] > b[ball]).all()
        neutral = ~ball
        np.testing.assert_allclose(r[neutral], b[neutral], atol=1e-6)

    def test_shading_varies_with_slope(self, cams):
        # a bumpy terrain must produce non-constant terrain shading
        n = 293
        x = np.linspace(0, 8 * np.pi, n)
        hts = jnp.asarray(0.02 * (1 + np.sin(x))[None, :]
                          * np.ones((n, 1)), jnp.float32)
        sampler = hf.make_sampler(hts, None, 5.0, 1.0)
        out = self._rgbd(cams, sampler, (0.0, 0.0, 0.4))
        hit = out[0, 3] < 1.0 - 1e-6
        assert hit.sum() > 50
        assert np.std(out[0, 0][hit]) > 1e-3

    def test_vmap_batches(self, cams, flat_sampler):
        B = 3
        pos = jnp.tile(jnp.array([0.0, 0.0, 0.4]), (B, 1))
        quat = jnp.tile(jnp.array([1.0, 0, 0, 0]), (B, 1))
        ball = jnp.tile(jnp.array([0.0, 0.0, 0.09]), (B, 1))
        out = jax.vmap(lambda p, q, bl: cams.render_rgbd(
            flat_sampler, p, q, bl))(pos, quat, ball)
        assert out.shape == (B, 2, 4, 64, 64)


def test_matmul_path_matches_einsum_path():
    """render_patch (constant-W matmul, lattice-snapped polar center) vs
    render_patch_einsum (exact bilinear at the true camera point): the snap
    approximation must stay within the fast path's documented silhouette
    tolerance."""
    from openballbot_rl_tpu.core.factories import create_terrain

    gen = create_terrain({"type": "perlin",
                          "config": {"scale": 25.0, "octaves": 4,
                                     "persistence": 0.2, "lacunarity": 2.0}})
    hts = jnp.asarray(gen(293, seed=11), jnp.float32).reshape(1, 293, 293)
    off = float(hf.spawn_height_offset(hts[0], 2.0))
    cams = DepthCameras()
    for shift, tilt in [((0.31, -0.17), 0.0), ((-0.92, 0.64), 0.1222)]:
        q = jnp.array([np.cos(tilt / 2), np.sin(tilt / 2), 0.0, 0.0],
                      jnp.float32)
        bp = jnp.array([shift[0], shift[1], 0.35 + off], jnp.float32)
        ball = bp + jnp.array([0.0, 0.0, -0.25], jnp.float32)
        a = np.asarray(cams.render_patch(hts, jnp.asarray(0), 5.0, 2.0,
                                         bp, q, ball))
        b = np.asarray(cams.render_patch_einsum(hts, jnp.asarray(0), 5.0,
                                                2.0, bp, q, ball))
        d = np.abs(a - b)
        assert d.mean() < 0.01, f"mean {d.mean():.4f} at {shift}"
        assert np.quantile(d, 0.95) < 0.03, \
            f"p95 {np.quantile(d, 0.95):.4f} at {shift}"


def test_patch_render_correct_at_world_border():
    """Near the terrain border the patch slice clamps; the edge-replicating
    recentre must keep depths tracking the exact marcher (which clamps
    queries to the world) instead of sampling around a wrong center."""
    from openballbot_rl_tpu.core.factories import create_terrain

    gen = create_terrain({"type": "perlin",
                          "config": {"scale": 25.0, "octaves": 4,
                                     "persistence": 0.2, "lacunarity": 2.0}})
    hts = jnp.asarray(gen(293, seed=13), jnp.float32).reshape(1, 293, 293)
    cams = DepthCameras()
    sam = hf.make_sampler(hts, jnp.asarray(0), 5.0, 2.0)
    for pos in [(0.0, 4.4), (4.4, 0.0), (-4.3, -4.3), (0.0, 4.95)]:
        gx = int((pos[0] + 5.0) / 10.0 * 292)
        gy = int((pos[1] + 5.0) / 10.0 * 292)
        h_local = float(hts[0, max(0, min(gy, 292)), max(0, min(gx, 292))]) * 2.0
        bp = jnp.array([pos[0], pos[1], h_local + 0.35], jnp.float32)
        q = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
        ball = bp + jnp.array([0.0, 0.0, -0.25], jnp.float32)
        exact = np.asarray(cams(sam, bp, q, ball))
        fast = np.asarray(cams.render_patch(hts, jnp.asarray(0), 5.0, 2.0,
                                            bp, q, ball))
        d = np.abs(exact - fast)
        assert d.mean() < 0.03, f"mean {d.mean():.4f} at {pos}"
        assert np.quantile(d, 0.95) < 0.08, \
            f"p95 {np.quantile(d, 0.95):.4f} at {pos}"


class TestCamTiles:
    """Aligned camera-tile renderer supply (hfield CAM_TILE_* +
    DepthCameras.render_tiles): one row gather replaces render_patch's
    per-env dynamic_slice; values must not move."""

    @pytest.fixture(scope="class")
    def terrain(self):
        from openballbot_rl_tpu.core.factories import create_terrain

        gen = create_terrain({"type": "perlin",
                              "config": {"scale": 25.0, "octaves": 4,
                                         "persistence": 0.2,
                                         "lacunarity": 2.0}})
        return jnp.asarray(gen(293, seed=17), jnp.float32).reshape(1, 293, 293)

    @pytest.fixture(scope="class")
    def cam_tiles(self, terrain):
        return hf.make_tiles(terrain, hf.CAM_TILE_SIZE, hf.CAM_TILE_STRIDE,
                             dtype=jnp.bfloat16)

    def _poses(self):
        # interior, off-center, world border, beyond-border excursion
        return [((0.31, -0.17), 0.0), ((-2.92, 1.64), 0.1222),
                ((4.6, -4.6), 0.0), ((0.0, 4.97), 0.05)]

    def test_bitwise_vs_render_patch_pow2_zscale(self, terrain, cam_tiles):
        """zscale=2 (the shipped value): bf16 scaling commutes exactly, so
        tiles must reproduce render_patch BIT FOR BIT. render_patch's own
        patch is f32 but downcast to bf16 before any arithmetic, so both
        paths feed identical bf16 heights through identical contractions."""
        n = terrain.shape[-1]
        T = hf.tiles_per_dim(n, hf.CAM_TILE_SIZE, hf.CAM_TILE_STRIDE)
        cams = DepthCameras()
        off = float(hf.spawn_height_offset(terrain[0], 2.0))
        for shift, tilt in self._poses():
            q = jnp.array([np.cos(tilt / 2), np.sin(tilt / 2), 0.0, 0.0],
                          jnp.float32)
            bp = jnp.array([shift[0], shift[1], 0.35 + off], jnp.float32)
            ball = bp + jnp.array([0.0, 0.0, -0.25], jnp.float32)
            a = np.asarray(cams.render_patch(terrain, jnp.asarray(0), 5.0,
                                             2.0, bp, q, ball))
            b = np.asarray(cams.render_tiles(cam_tiles, jnp.asarray(0), T, n,
                                             5.0, 2.0, bp, q, ball))
            np.testing.assert_array_equal(a, b, err_msg=f"at {shift}")

    def test_tolerance_vs_render_patch_any_zscale(self, terrain, cam_tiles):
        """Non-power-of-two zscale: scale-then-round vs round-then-scale
        differ by <= 1 ulp(bf16) in heights (~0.4%); depth differences stay
        far under the fast path's own tolerance vs the exact marcher."""
        n = terrain.shape[-1]
        T = hf.tiles_per_dim(n, hf.CAM_TILE_SIZE, hf.CAM_TILE_STRIDE)
        cams = DepthCameras()
        off = float(hf.spawn_height_offset(terrain[0], 1.7))
        for shift, tilt in self._poses():
            q = jnp.array([np.cos(tilt / 2), np.sin(tilt / 2), 0.0, 0.0],
                          jnp.float32)
            bp = jnp.array([shift[0], shift[1], 0.35 + off], jnp.float32)
            ball = bp + jnp.array([0.0, 0.0, -0.25], jnp.float32)
            a = np.asarray(cams.render_patch(terrain, jnp.asarray(0), 5.0,
                                             1.7, bp, q, ball))
            b = np.asarray(cams.render_tiles(cam_tiles, jnp.asarray(0), T, n,
                                             5.0, 1.7, bp, q, ball))
            d = np.abs(a - b)
            assert d.mean() < 0.002, f"mean {d.mean():.5f} at {shift}"
            assert np.quantile(d, 0.99) < 0.02, \
                f"p99 {np.quantile(d, 0.99):.4f} at {shift}"

    def test_cam_tile_select_containment(self):
        """Every recentred patch row clip(crow - P//2 + v, 0, n-1) must land
        inside the selected tile for any camera grid coordinate (including
        off-world excursions) — the condition under which render_tiles'
        guard clip is a no-op and parity with render_patch holds."""
        n = 293
        P = DepthCameras().cfg.patch_n
        Pc, S = hf.CAM_TILE_SIZE, hf.CAM_TILE_STRIDE
        T = hf.tiles_per_dim(n, Pc, S)
        assert Pc >= P + 1 + S, "camera tile too small for the patch window"
        crows = jnp.arange(-40, n + 40, dtype=jnp.int32)
        _, a0, _ = jax.vmap(
            lambda r: hf.cam_tile_select(jnp.asarray(0), r, r, T))(crows)
        a0 = np.asarray(a0)
        rows = np.asarray(crows)[:, None] - P // 2 + np.arange(P)[None, :]
        rows = np.clip(rows, 0, n - 1)
        local = rows - a0[:, None]
        assert (local >= 0).all(), "patch row below tile origin"
        assert (local <= Pc - 1).all(), "patch row beyond tile end"
