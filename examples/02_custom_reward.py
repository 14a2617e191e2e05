#!/usr/bin/env python
"""Example 02 — custom reward: register a reward and use it in the env.

(Reference: examples/02_custom_reward.py — subclass BaseReward + registry.
Here a reward is a pure callable obs->scalar; registration is identical.)
"""
from openballbot_rl_tpu.utils.devices import force_cpu

force_cpu()

import jax
import jax.numpy as jnp

from openballbot_rl_tpu.core.factories import create_reward, create_terrain
from openballbot_rl_tpu.core.registry import ComponentRegistry
from openballbot_rl_tpu.envs import BallbotEnv, EnvParams, make_terrain_bank
from openballbot_rl_tpu.rewards.base import BaseReward


class SpinPenaltyReward(BaseReward):
    """Reward forward progress, penalize angular velocity."""

    def __init__(self, target_direction=(0.0, 1.0), spin_coef=0.1):
        self.dir = jnp.asarray(target_direction, jnp.float32)
        self.spin_coef = float(spin_coef)

    def __call__(self, obs):
        progress = jnp.dot(obs["vel"][:2], self.dir)
        spin = jnp.sum(obs["angular_vel"] ** 2)
        return progress - self.spin_coef * spin


# register under a name -> usable from YAML configs ("type: spin_penalty")
ComponentRegistry.register_reward("spin_penalty", SpinPenaltyReward)

reward = create_reward({"type": "spin_penalty",
                        "config": {"spin_coef": 0.05}})
env = BallbotEnv(EnvParams(), reward_fn=reward)
gen = create_terrain({"type": "flat", "config": {}})
bank = make_terrain_bank(gen, env.model.hfield_n, 2.0,
                         jax.random.PRNGKey(0), 2)
state, obs = env.reset(bank, jax.random.PRNGKey(0))
state, obs, r, d, info = env.step(bank, state, jnp.zeros(3))
print(f"custom reward after one step: {float(r):+.5f}")
