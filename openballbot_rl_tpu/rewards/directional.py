"""Directional reward (mirrors ballbot_gym/rewards/directional.py:8-54)."""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from openballbot_rl_tpu.rewards.base import BaseReward


class DirectionalReward(BaseReward):
    """Dot product of the ground-plane (x, y) velocity with a target direction.

    The reference computes state["vel"][-3:-1] @ target (directional.py:48-54).
    NOTE: in the reference env, obs["vel"] is fed from data.cvel[:3], which in
    MuJoCo is the *angular* velocity (see envs/obs docs) — the framework's env
    exposes a `cvel_swap` compat flag to reproduce that behavior; this reward
    simply consumes whatever the env puts in "vel".
    """

    def __init__(self, target_direction):
        self.target_direction = jnp.asarray(
            np.asarray(target_direction, dtype=np.float32))

    def __call__(self, state: Dict):
        xy_velocity = state["vel"][..., -3:-1]
        return jnp.sum(xy_velocity * self.target_direction, axis=-1)
