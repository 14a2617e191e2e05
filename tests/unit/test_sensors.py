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
