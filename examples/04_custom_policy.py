#!/usr/bin/env python
"""Example 04 — custom policy network.

(Reference: examples/04_custom_policy.py — a custom SB3 features extractor.
Here the policy is a flax module; swap ActorCritic's trunk or write your
own module with the same (obs) -> (mean, log_std, value) contract.)
"""
from openballbot_rl_tpu.utils.devices import force_cpu

force_cpu()

import flax.linen as nn
import jax
import jax.numpy as jnp

from openballbot_rl_tpu.core.factories import create_terrain
from openballbot_rl_tpu.envs import BallbotEnv, EnvParams, make_terrain_bank
from openballbot_rl_tpu.train import PPO, PPOConfig


class TinyActorCritic(nn.Module):
    """A smaller 2x64 trunk with the same output contract as ActorCritic."""
    action_dim: int = 3

    @nn.compact
    def __call__(self, obs, train: bool = False):
        x = jnp.concatenate([obs[k] for k in sorted(obs)], axis=-1)
        for i in range(2):
            x = nn.relu(nn.Dense(64, name=f"fc{i}")(x))
        mean = nn.Dense(self.action_dim, name="pi")(x)
        value = nn.Dense(1, name="vf")(x)[..., 0]
        log_std = self.param("log_std", nn.initializers.zeros,
                             (self.action_dim,))
        return mean, log_std, value


env = BallbotEnv(EnvParams(max_ep_steps=100))
gen = create_terrain({"type": "flat", "config": {}})
bank = make_terrain_bank(gen, env.model.hfield_n, 2.0,
                         jax.random.PRNGKey(0), 2)

cfg = PPOConfig(num_envs=8, n_steps=32, batch_size=64, n_epochs=1,
                total_timesteps=512)
algo = PPO(env, cfg, network=TinyActorCritic())
rs = algo.init(bank, jax.random.PRNGKey(0))
rs, metrics = algo.train_iteration(rs, bank)
print(f"one PPO iteration with a custom policy: "
      f"pg_loss {float(metrics['pg_loss']):+.5f}, "
      f"value_loss {float(metrics['v_loss']):.5f}")
