"""Eval-config resolution for ballbot-eval.

Regression: the run config stores components under problem.* and
get_component_config prefers problem.* over top level, so an eval config's
top-level terrain override used to lose silently to the run's entry
(reference terrain priority: evaluate.py:51-76 — CLI > eval cfg > run cfg).
"""
import pytest

from openballbot_rl_tpu.cli.evaluate import resolve_eval_config

RUN_CFG = {
    "problem": {
        "terrain": {"type": "perlin", "config": {"amplitude": 0.15}},
        "reward": {"type": "directional",
                   "config": {"target_direction": [0.0, 1.0], "scale": 0.01}},
    },
    "terrain": {"type": "perlin", "config": {"amplitude": 0.15}},
    "env": {"max_ep_steps": 4000},
    "camera": {"enabled": False},
}


@pytest.mark.unit
def test_eval_config_terrain_overrides_run_problem():
    eval_cfg = {"terrain": {"type": "perlin", "config": {"amplitude": 0.08}}}
    merged = resolve_eval_config(eval_cfg, RUN_CFG)
    assert merged["problem"]["terrain"]["config"]["amplitude"] == 0.08
    # run-config fields not mentioned by the eval config survive
    assert merged["env"]["max_ep_steps"] == 4000
    assert merged["problem"]["reward"]["config"]["scale"] == 0.01


@pytest.mark.unit
def test_eval_config_problem_nested_override():
    eval_cfg = {"problem": {"terrain": {"type": "flat", "config": {}}}}
    merged = resolve_eval_config(eval_cfg, RUN_CFG)
    assert merged["problem"]["terrain"]["type"] == "flat"


@pytest.mark.unit
def test_cli_terrain_beats_eval_config():
    eval_cfg = {"terrain": {"type": "perlin", "config": {"amplitude": 0.08}}}
    merged = resolve_eval_config(eval_cfg, RUN_CFG, terrain="flat")
    assert merged["problem"]["terrain"] == {"type": "flat", "config": {}}


@pytest.mark.unit
def test_no_eval_config_keeps_run_terrain():
    merged = resolve_eval_config({}, RUN_CFG)
    assert merged["problem"]["terrain"]["config"]["amplitude"] == 0.15


@pytest.mark.unit
def test_no_run_config():
    eval_cfg = {"terrain": {"type": "bowl", "config": {}}}
    merged = resolve_eval_config(eval_cfg, {})
    assert merged["problem"]["terrain"]["type"] == "bowl"


@pytest.mark.unit
def test_run_config_mutation_isolated():
    run = {"problem": {"terrain": {"type": "perlin", "config": {}}}}
    eval_cfg = {"terrain": {"type": "flat", "config": {}}}
    merged = resolve_eval_config(eval_cfg, run)
    assert run["problem"]["terrain"]["type"] == "perlin"
    assert merged["problem"]["terrain"]["type"] == "flat"


class TestLockstepEval:
    """The round-4 lockstep batched eval (eval/evaluate.lockstep_episodes)
    must reproduce the per-episode while_loop formulation it replaced:
    ticks are lockstep from reset, so the scalar render/refresh cadence
    fires exactly where the per-env cadence did."""

    def _reference_episodes(self, env, act1, n_episodes, max_steps, bank,
                            key, gamma=0.99999):
        """The pre-round-4 formulation: vmap of per-episode while_loop."""
        import jax
        import jax.numpy as jnp

        def one_episode(key):
            state, obs = env.reset(bank, key)

            def body(carry):
                state, obs, ret, dret, disc, length, done = carry
                state, obs, reward, d, _ = env.step(bank, state, act1(obs))
                return (state, obs, ret + reward, dret + disc * reward,
                        disc * gamma, length + 1, d)

            def cond(carry):
                *_, length, done = carry
                return jnp.logical_and(~done, length < max_steps)

            init = (state, obs, jnp.zeros(()), jnp.zeros(()), jnp.ones(()),
                    jnp.zeros((), jnp.int32), jnp.array(False))
            _, _, ret, dret, _, length, _ = jax.lax.while_loop(cond, body,
                                                               init)
            return ret, dret, length

        return jax.vmap(one_episode)(jax.random.split(key, n_episodes))

    def _bank(self, n=293):
        import jax
        from openballbot_rl_tpu.core.factories import create_terrain
        from openballbot_rl_tpu.envs import make_terrain_bank

        gen = create_terrain({"type": "perlin",
                              "config": {"scale": 25.0, "octaves": 4,
                                         "persistence": 0.2,
                                         "lacunarity": 2.0}})
        return make_terrain_bank(gen, n, 2.0, jax.random.PRNGKey(0), 2)

    def test_matches_per_episode_reference_blind(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from openballbot_rl_tpu.envs import BallbotEnv, EnvParams
        from openballbot_rl_tpu.eval.evaluate import lockstep_episodes

        env = BallbotEnv(EnvParams(max_ep_steps=60))
        bank = self._bank()

        def act1(obs):      # deterministic nontrivial policy
            return jnp.tanh(obs["orientation"] + 0.3 * obs["angular_vel"])

        key = jax.random.PRNGKey(7)
        a = jax.jit(lambda: lockstep_episodes(env, act1, 6, 80, bank, key))()
        b = jax.jit(lambda: self._reference_episodes(env, act1, 6, 80, bank,
                                                     key))()
        # ret and len are BITWISE; dret's alive-mask multiply admits a
        # different fma fusion than the reference accumulation (1 ulp)
        for va, vb, name, rt in zip(a, b, ("ret", "dret", "len"),
                                    (0.0, 1e-6, 0.0)):
            np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                       rtol=rt, atol=0, err_msg=name)

    def test_matches_per_episode_reference_vision(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from openballbot_rl_tpu.envs import EnvParams
        from openballbot_rl_tpu.envs.vision import (VisionBallbotEnv,
                                                    VisionParams)
        from openballbot_rl_tpu.eval.evaluate import lockstep_episodes

        env = VisionBallbotEnv(EnvParams(max_ep_steps=30),
                               VisionParams(height=16, width=16,
                                            frame_skip=6))
        bank = self._bank()

        def act1(obs):      # reads the image so renders matter
            img = obs["rgbd_0"]           # (..., C, H, W)
            g = jnp.mean(img, axis=(-1, -2, -3))       # per-env scalar
            return jnp.tanh(obs["orientation"] + g[..., None] * 0.1
                            + 0.0 * obs["relative_image_timestamp"])

        key = jax.random.PRNGKey(9)
        a = jax.jit(lambda: lockstep_episodes(env, act1, 3, 40, bank, key))()
        b = jax.jit(lambda: self._reference_episodes(env, act1, 3, 40, bank,
                                                     key))()
        for va, vb, name, rt in zip(a, b, ("ret", "dret", "len"),
                                    (0.0, 1e-6, 0.0)):
            np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                       rtol=rt, atol=0, err_msg=name)
