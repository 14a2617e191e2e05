"""Reward tests (mirror of reference tests/unit/test_rewards.py:10-72)."""
import numpy as np
import pytest

import openballbot_rl_tpu.rewards as R
from openballbot_rl_tpu.core.factories import create_reward


def test_directional_sign(test_state):
    fwd = R.DirectionalReward(np.array([0.0, 1.0]))
    assert float(fwd(test_state)) == pytest.approx(0.3, abs=1e-6)
    back = R.DirectionalReward(np.array([0.0, -1.0]))
    assert float(back(test_state)) == pytest.approx(-0.3, abs=1e-6)


def test_distance_penalty(test_state):
    r = R.DistanceReward(np.array([1.0, 2.0]), scale=2.0)
    assert float(r(test_state)) == pytest.approx(0.0, abs=1e-6)
    far = dict(test_state, pos2d=np.array([4.0, 6.0], np.float32))
    assert float(r(far)) == pytest.approx(-2.0 * 5.0, abs=1e-5)


def test_distance_requires_pos2d():
    r = R.DistanceReward([0.0, 0.0])
    with pytest.raises(ValueError, match="pos2d"):
        r({"vel": np.zeros(3)})


def test_distance_shape_validation():
    with pytest.raises(ValueError, match="shape"):
        R.DistanceReward([1.0, 2.0, 3.0])


def test_factory_roundtrip(reward_config, test_state):
    r = create_reward(reward_config)
    assert isinstance(r, R.DirectionalReward)
    assert float(r(test_state)) == pytest.approx(0.3, abs=1e-6)


def test_factory_missing_key():
    with pytest.raises(ValueError, match="target_direction"):
        create_reward({"type": "directional", "config": {}})
    with pytest.raises(ValueError, match="goal_position"):
        create_reward({"type": "distance", "config": {}})


def test_jit_compatible(test_state):
    import jax

    r = R.DirectionalReward(np.array([0.0, 1.0]))
    out = jax.jit(r)({k: np.asarray(v) for k, v in test_state.items()})
    assert float(out) == pytest.approx(0.3, abs=1e-6)
