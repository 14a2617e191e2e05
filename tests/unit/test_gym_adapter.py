"""Gymnasium adapter tests (reference surface: gym.make("ballbot-v0.1"),
ballbot_gym/__init__.py:36-53 + ballbot_env.py step/reset API)."""
import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")


@pytest.fixture(scope="module")
def env():
    import openballbot_rl_tpu  # noqa: F401 — registration side effect

    e = gym.make("ballbot-v0.1", terrain_type="flat", max_ep_steps=20,
                 bank_size=2)
    yield e
    e.close()


class TestGymAdapter:
    def test_registered(self):
        import openballbot_rl_tpu  # noqa: F401

        assert "ballbot-v0.1" in gym.registry

    def test_reset_step_contract(self, env):
        obs, info = env.reset(seed=3)
        assert set(obs) == {"orientation", "angular_vel", "vel",
                            "motor_state", "actions"}
        assert all(isinstance(v, np.ndarray) for v in obs.values())
        obs, r, term, trunc, info = env.step(np.zeros(3))
        assert isinstance(r, float)
        assert trunc is False            # SURVEY.md §2.5.5 quirk preserved
        assert "failure" in info and "terrain_seed" in info

    def test_max_steps_terminates_and_enforces_reset(self, env):
        env.reset(seed=4)
        term = False
        for t in range(25):
            obs, r, term, trunc, info = env.step(np.zeros(3))
            if term:
                break
        assert term and t + 1 == 20
        with pytest.raises(RuntimeError, match="reset"):
            env.step(np.zeros(3))
        env.reset()
        env.step(np.zeros(3))

    def test_seeded_reset_reproducible(self, env):
        o1, _ = env.reset(seed=11)
        o2, _ = env.reset(seed=11)
        for k in o1:
            np.testing.assert_array_equal(o1[k], o2[k])

    def test_spaces(self, env):
        space = env.observation_space
        assert "orientation" in space.spaces
        assert env.action_space.shape == (3,)
        obs, _ = env.reset(seed=0)
        assert space.contains({k: v.astype(np.float32)
                               for k, v in obs.items()})


def test_rgbd_mode_space_and_obs():
    import gymnasium as gym

    env = gym.make("ballbot-v0.1", terrain_type="flat", max_ep_steps=20,
                   disable_cameras=False, depth_only=False,
                   im_shape=(16, 16), bank_size=2)
    assert env.observation_space["rgbd_0"].shape == (4, 16, 16)
    obs, _ = env.reset(seed=0)
    assert obs["rgbd_0"].shape == (4, 16, 16)
    assert env.observation_space["rgbd_0"].contains(obs["rgbd_0"])
    env.close()
