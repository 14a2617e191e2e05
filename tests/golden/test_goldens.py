"""Golden regression tests (SURVEY.md §4: the verification instruments the
reference lacks — fixed-seed golden trajectories + terrain signatures).

Regenerate via tools/make_goldens.py ONLY for intended semantic changes.
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__))


@pytest.fixture(scope="module")
def physics_golden():
    return np.load(os.path.join(GOLDEN_DIR, "physics_trajectories.npz"))


@pytest.fixture(scope="module")
def terrain_golden():
    return np.load(os.path.join(GOLDEN_DIR, "terrain_signatures.npz"))


@pytest.mark.parametrize("name,tcfg,seed", [
    ("flat", {"type": "flat", "config": {}}, 3),
    ("perlin", {"type": "perlin", "config": {"scale": 25.0, "octaves": 4,
                                             "persistence": 0.2,
                                             "lacunarity": 2.0}}, 7),
])
def test_physics_trajectory_matches_golden(physics_golden, name, tcfg, seed):
    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.physics import (
        ContactParams, init_state, make_model, step)
    from openballbot_rl_tpu.physics.hfield import spawn_height_offset

    m = make_model().as_jnp()
    gen = create_terrain(tcfg)
    terr = jnp.asarray(gen(m.hfield_n, seed=seed), jnp.float32).reshape(
        m.hfield_n, m.hfield_n)
    s = init_state(m, spawn_height_offset(terr, 2.0))
    stepf = jax.jit(functools.partial(step, m, ContactParams(), terr, 2.0))
    torques = jax.random.uniform(jax.random.PRNGKey(42), (1000, 3),
                                 minval=-3.0, maxval=3.0)

    @jax.jit
    def chunk(s, tq):
        def f(s, t):
            return stepf(s, t), None
        return jax.lax.scan(f, s, tq)[0]

    snaps = []
    for i in range(10):
        s = chunk(s, torques[i * 100:(i + 1) * 100])
        snaps.append(np.concatenate([
            np.asarray(s.base_pos), np.asarray(s.base_quat),
            np.asarray(s.ball_pos), np.asarray(s.base_vel),
            np.asarray(s.wheel_vel)]))
    got = np.stack(snaps)
    want = physics_golden[name]
    # fp32 + scheduling differences accumulate over 1000 contact-rich steps;
    # positions/quaternions must track to mm/1e-3 rad scale
    np.testing.assert_allclose(got[:, :10], want[:, :10], atol=2e-3,
                               err_msg=f"{name} pose drifted from golden")
    np.testing.assert_allclose(got, want, atol=5e-2,
                               err_msg=f"{name} velocities drifted from golden")


def test_terrain_signatures_match_golden(terrain_golden):
    import openballbot_rl_tpu  # noqa: F401
    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.core.registry import ComponentRegistry

    missing = []
    for t in sorted(ComponentRegistry.list_terrains()):
        if t not in terrain_golden:
            missing.append(t)
            continue
        cfg = {}
        if t == "mixed":
            cfg = {"components": [
                {"type": "perlin", "weight": 0.6, "config": {"scale": 20.0}},
                {"type": "hills", "weight": 0.4, "config": {}}]}
        gen = create_terrain({"type": t, "config": cfg})
        g = np.asarray(gen(65, seed=123), np.float32)
        sig = np.concatenate([[g.mean(), g.std(), g.min(), g.max()],
                              g.reshape(65, 65)[32, ::8]])
        np.testing.assert_allclose(
            sig, terrain_golden[t], atol=1e-5,
            err_msg=f"terrain '{t}' output changed vs golden")
    assert not missing, f"no golden for terrains: {missing} " \
                        f"(regenerate tools/make_goldens.py)"


@pytest.fixture(scope="module")
def env_golden():
    return np.load(os.path.join(GOLDEN_DIR, "env_rollouts.npz"))


@pytest.mark.parametrize("name,swap", [("cvel_default", False),
                                       ("cvel_swap", True)])
def test_env_rollout_matches_golden(env_golden, name, swap):
    """Pins obs/reward streams for BOTH settings of the cvel_swap compat
    flag (envs/env.py:72) — the reference-repo-behavior path is golden-
    tested, not just the paper-correct default."""
    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.envs import BallbotEnv, EnvParams, make_terrain_bank

    env = BallbotEnv(EnvParams(max_ep_steps=200, cvel_swap=swap))
    gen = create_terrain({"type": "perlin", "config": {}})
    bank = make_terrain_bank(gen, env.model.hfield_n, 2.0,
                             jax.random.PRNGKey(5), 2)
    states, obs = jax.jit(env.batch_reset)(
        bank, jax.random.split(jax.random.PRNGKey(6), 4))
    acts = jax.random.uniform(jax.random.PRNGKey(7), (100, 4, 3),
                              minval=-1.0, maxval=1.0)
    stepf = jax.jit(env.batch_step)
    rewards, obs_snaps = [], []
    for i in range(100):
        states, obs, r, d, _ = stepf(bank, states, acts[i])
        rewards.append(np.asarray(r))
        if (i + 1) % 25 == 0:
            obs_snaps.append(np.concatenate(
                [np.asarray(obs[k]) for k in sorted(obs)], axis=-1))
    np.testing.assert_allclose(np.stack(rewards),
                               env_golden[f"{name}_rewards"], atol=1e-4,
                               err_msg=f"{name}: reward stream drifted")
    np.testing.assert_allclose(np.stack(obs_snaps),
                               env_golden[f"{name}_obs"], atol=2e-3,
                               err_msg=f"{name}: obs stream drifted")


def test_cvel_swap_is_exact_channel_swap(env_golden):
    """The two flag settings must expose the SAME two vectors on swapped
    keys (obs['vel'] <-> obs['angular_vel']); everything else identical."""
    KEYS = sorted(["orientation", "angular_vel", "vel", "motor_state",
                   "actions"])
    a = env_golden["cvel_default_obs"]
    b = env_golden["cvel_swap_obs"]
    cols = {k: slice(i * 3, (i + 1) * 3) for i, k in enumerate(KEYS)}
    np.testing.assert_array_equal(a[..., cols["vel"]],
                                  b[..., cols["angular_vel"]])
    np.testing.assert_array_equal(a[..., cols["angular_vel"]],
                                  b[..., cols["vel"]])
    for k in ("orientation", "motor_state", "actions"):
        np.testing.assert_array_equal(a[..., cols[k]], b[..., cols[k]])
