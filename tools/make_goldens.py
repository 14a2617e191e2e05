#!/usr/bin/env python
"""Generate golden regression data (tests/golden/*.npz).

Goldens pin the numerical behavior of (a) the physics engine on fixed
trajectories and (b) all 13 terrain generators at fixed seeds, so that
refactors (e.g. layout rewrites for TPU) are verified not to change
semantics. Regenerate ONLY when a semantic change is intended:

    python tools/make_goldens.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from openballbot_rl_tpu.utils.devices import force_cpu  # noqa: E402

force_cpu()

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def physics_golden():
    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.physics import (
        ContactParams, init_state, make_model, step)
    from openballbot_rl_tpu.physics.hfield import spawn_height_offset

    m = make_model().as_jnp()
    cp = ContactParams()
    out = {}
    for name, tcfg, seed in [("flat", {"type": "flat", "config": {}}, 3),
                             ("perlin", {"type": "perlin", "config":
                                         {"scale": 25.0, "octaves": 4,
                                          "persistence": 0.2,
                                          "lacunarity": 2.0}}, 7)]:
        gen = create_terrain(tcfg)
        terr = jnp.asarray(gen(m.hfield_n, seed=seed), jnp.float32).reshape(
            m.hfield_n, m.hfield_n)
        off = spawn_height_offset(terr, 2.0)
        s = init_state(m, off)
        stepf = jax.jit(functools.partial(step, m, cp, terr, 2.0))
        # deterministic pseudo-random torque sequence
        key = jax.random.PRNGKey(42)
        torques = jax.random.uniform(key, (1000, 3), minval=-3.0, maxval=3.0)
        snaps = []
        for i in range(1000):
            s = stepf(s, torques[i])
            if (i + 1) % 100 == 0:
                snaps.append(np.concatenate([
                    np.asarray(s.base_pos), np.asarray(s.base_quat),
                    np.asarray(s.ball_pos), np.asarray(s.base_vel),
                    np.asarray(s.wheel_vel)]))
        out[name] = np.stack(snaps)
        print(f"physics golden '{name}': {out[name].shape}, "
              f"final base z {out[name][-1][2]:.4f}")
    np.savez(os.path.join(GOLDEN_DIR, "physics_trajectories.npz"), **out)


def terrain_golden():
    import openballbot_rl_tpu  # noqa: F401
    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.core.registry import ComponentRegistry

    out = {}
    for t in sorted(ComponentRegistry.list_terrains()):
        cfg = {}
        if t == "mixed":  # composition needs an explicit component list
            cfg = {"components": [
                {"type": "perlin", "weight": 0.6, "config": {"scale": 20.0}},
                {"type": "hills", "weight": 0.4, "config": {}}]}
        gen = create_terrain({"type": t, "config": cfg})
        g = np.asarray(gen(65, seed=123), np.float32)
        # compact signature: stats + a fixed probe row
        out[t] = np.concatenate([[g.mean(), g.std(), g.min(), g.max()],
                                 g.reshape(65, 65)[32, ::8]])
        print(f"terrain golden '{t}': mean {g.mean():.4f} std {g.std():.4f}")
    np.savez(os.path.join(GOLDEN_DIR, "terrain_signatures.npz"), **out)


def env_golden():
    """Env-level rollout goldens pinning BOTH settings of the cvel_swap
    compat flag (envs/env.py:72 — reference repo behavior vs paper-correct
    obs mapping), so the untested-compat-path drift risk flagged in round 1
    is closed."""
    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.envs import BallbotEnv, EnvParams, make_terrain_bank

    out = {}
    gen = create_terrain({"type": "perlin", "config": {}})
    for name, swap in [("cvel_default", False), ("cvel_swap", True)]:
        env = BallbotEnv(EnvParams(max_ep_steps=200, cvel_swap=swap))
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
        out[f"{name}_rewards"] = np.stack(rewards)
        out[f"{name}_obs"] = np.stack(obs_snaps)
        print(f"env golden '{name}': reward sum {out[f'{name}_rewards'].sum():+.4f}")
    np.savez(os.path.join(GOLDEN_DIR, "env_rollouts.npz"), **out)


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    physics_golden()
    terrain_golden()
    env_golden()
    print("goldens written to", GOLDEN_DIR)
