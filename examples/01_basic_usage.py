#!/usr/bin/env python
"""Example 01 — basic usage: create the env, reset, step.

(Reference: examples/01_basic_usage.py — gym.make("ballbot-v0.1") + step
loop. Here the env is a pair of pure functions over explicit state.)
"""
from openballbot_rl_tpu.utils.devices import force_cpu

force_cpu()          # drop this line to run on the TPU

import jax
import jax.numpy as jnp

from openballbot_rl_tpu.core.factories import create_terrain
from openballbot_rl_tpu.envs import BallbotEnv, EnvParams, make_terrain_bank

# 1. build the env (static config resolved before tracing)
env = BallbotEnv(EnvParams(max_ep_steps=4000))

# 2. terrain bank: per-episode terrains drawn from pre-generated seeds
gen = create_terrain({"type": "flat", "config": {}})
bank = make_terrain_bank(gen, env.model.hfield_n, zscale=2.0,
                         key=jax.random.PRNGKey(0), bank_size=4)

# 3. reset -> (state, obs); step -> (state, obs, reward, done, info)
state, obs = env.reset(bank, jax.random.PRNGKey(42))
print("obs keys:", sorted(obs.keys()))

total = 0.0
for t in range(100):
    action = jnp.zeros(3)                    # actions in [-1, 1]^3
    state, obs, reward, done, info = env.step(bank, state, action)
    total += float(reward)
print(f"100 zero-action steps: return {total:+.3f}, "
      f"tilt-failure={bool(info['failure'])}")

# 4. the same env, batched over 512 parallel instances on one device
states, obs = jax.jit(env.batch_reset)(
    bank, jax.random.split(jax.random.PRNGKey(1), 512))
states, obs, rewards, dones, infos = jax.jit(env.batch_step)(
    bank, states, jnp.zeros((512, 3)))
print(f"batched step: rewards {rewards.shape}, mean {rewards.mean():+.4f}")
