"""Env layer tests (counterpart of reference tests/unit/test_env.py:7-90 —
but against the functional env, including auto-reset and batch semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openballbot_rl_tpu.core.factories import create_terrain
from openballbot_rl_tpu.envs import (
    BallbotEnv, EnvParams, make_env_from_config, make_terrain_bank)


@pytest.fixture(scope="module")
def env_and_bank():
    env = BallbotEnv(EnvParams(max_ep_steps=50))
    gen = create_terrain({"type": "flat", "config": {}})
    bank = make_terrain_bank(gen, env.model.hfield_n, 2.0,
                             jax.random.PRNGKey(0), 2)
    return env, bank


def test_reset_obs_structure(env_and_bank):
    env, bank = env_and_bank
    state, obs = env.reset(bank, jax.random.PRNGKey(1))
    assert set(obs) == {"orientation", "angular_vel", "vel", "motor_state",
                        "actions"}
    for v in obs.values():
        assert v.shape == (3,)
    assert int(state.step_counter) == 0


def test_step_returns_and_types(env_and_bank):
    env, bank = env_and_bank
    state, obs = env.reset(bank, jax.random.PRNGKey(1))
    state, obs, reward, done, info = env.step(bank, state, jnp.zeros(3))
    assert reward.shape == () and done.shape == ()
    assert int(state.step_counter) == 1
    assert "pos2d" in info and info["pos2d"].shape == (2,)


def test_max_steps_terminates_and_autoresets(env_and_bank):
    env, bank = env_and_bank

    @jax.jit
    def run(key):
        state, obs = env.reset(bank, key)

        def f(carry, _):
            state, obs = carry
            state, obs, r, d, info = env.step(bank, state, jnp.zeros(3))
            return (state, obs), (d, info["step_counter"])
        (state, _), (dones, counters) = jax.lax.scan(f, (state, obs), None,
                                                     length=120)
        return dones, counters

    dones, counters = run(jax.random.PRNGKey(2))
    dones = np.asarray(dones)
    counters = np.asarray(counters)
    # episode ends exactly at max_ep_steps=50 (terminated, quirk 2.5.5)
    assert dones[49] and dones[99]
    assert counters[49] == 50 and counters[50] == 1  # auto-reset restarted


def test_tilt_terminates(env_and_bank):
    env, bank = env_and_bank
    state, obs = env.reset(bank, jax.random.PRNGKey(3))
    # tip the robot beyond 20 degrees manually
    from openballbot_rl_tpu.physics.rotations import quat_from_axis_angle
    tipped = state.phys.replace(
        base_quat=quat_from_axis_angle(jnp.array([1.0, 0, 0]),
                                       jnp.radians(25.0)))
    state = state.replace(phys=tipped)
    _, _, reward, done, info = env.step(bank, state, jnp.zeros(3))
    assert bool(done) and bool(info["failure"])


def test_survival_bonus_and_action_reg(env_and_bank):
    env, bank = env_and_bank
    state, _ = env.reset(bank, jax.random.PRNGKey(4))
    _, _, r0, _, _ = env.step(bank, state, jnp.zeros(3))
    _, _, r1, _, _ = env.step(bank, state, jnp.ones(3))
    # action reg -0.0001 * ||a||^2 = -0.0003 difference (directional term
    # differs only via physics response at step 1, which is ~1e-5)
    assert float(r0) > float(r1)
    assert float(r0) == pytest.approx(0.02, abs=5e-3)  # survival-dominated


def test_cvel_swap_flag():
    env_fix = BallbotEnv(EnvParams(cvel_swap=False))
    env_swap = BallbotEnv(EnvParams(cvel_swap=True))
    gen = create_terrain({"type": "flat", "config": {}})
    bank = make_terrain_bank(gen, env_fix.model.hfield_n, 2.0,
                             jax.random.PRNGKey(0), 1)
    state, _ = env_fix.reset(bank, jax.random.PRNGKey(5))
    ph = state.phys.replace(base_vel=jnp.array([0.5, 0.0, 0.0]),
                            base_angvel=jnp.array([0.0, 0.0, 0.3]))
    o_fix = env_fix._get_obs(ph, jnp.zeros(3))
    o_swap = env_swap._get_obs(ph, jnp.zeros(3))
    assert float(o_fix["vel"][0]) == pytest.approx(0.5, abs=2e-3)
    assert float(o_fix["angular_vel"][2]) == pytest.approx(0.3, abs=2e-3)
    # swapped mode reproduces the repo's cvel misread
    assert float(o_swap["vel"][2]) == pytest.approx(0.3, abs=2e-3)
    assert float(o_swap["angular_vel"][0]) == pytest.approx(0.5, abs=2e-3)


def test_make_env_from_config():
    cfg = {
        "problem": {
            "terrain": {"type": "ramp", "config": {"ramp_angle": 10.0}},
            "reward": {"type": "directional",
                       "config": {"target_direction": [1.0, 0.0],
                                  "scale": 0.02}},
        },
        "env": {"max_ep_steps": 123},
    }
    env, gen = make_env_from_config(cfg)
    assert env.params.max_ep_steps == 123
    assert env.params.reward_scale == 0.02
    import math
    assert env.params.zscale == pytest.approx(10.0 * math.tan(math.radians(10.0)))
    t = np.asarray(gen(61, seed=0))
    assert t.shape == (61 * 61,)


def test_terrain_bank_seed_semantics():
    gen = create_terrain({"type": "perlin", "config": {}})
    b1 = make_terrain_bank(gen, 61, 2.0, jax.random.PRNGKey(0), 4)
    b2 = make_terrain_bank(gen, 61, 2.0, jax.random.PRNGKey(0), 4)
    np.testing.assert_array_equal(np.asarray(b1.heights), np.asarray(b2.heights))
    assert np.asarray(b1.seeds).min() >= 0 and np.asarray(b1.seeds).max() < 10000
    bf = make_terrain_bank(gen, 61, 2.0, jax.random.PRNGKey(1), 3, fixed_seed=7)
    assert np.all(np.asarray(bf.seeds) == 7)


def test_terrain_bank_hills_rejects_traced_seeds():
    """hills/mixed bank generation is host-only in `seeds` (MT19937
    placement needs concrete values) — traced seeds must raise the clear
    TypeError, not an opaque TracerArrayConversionError."""
    import jax
    import pytest

    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.envs import make_terrain_bank
    from openballbot_rl_tpu.physics import make_model

    gen = create_terrain({"type": "hills", "config": {"num_hills": 2}})
    n = make_model().hfield_n

    @jax.jit
    def traced(key):
        return make_terrain_bank(gen, n, 2.0, key, 2)

    with pytest.raises(TypeError, match="concrete seeds"):
        traced(jax.random.PRNGKey(0))
