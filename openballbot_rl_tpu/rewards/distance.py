"""Distance-to-goal reward (mirrors ballbot_gym/rewards/distance.py:8-54)."""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from openballbot_rl_tpu.rewards.base import BaseReward


class DistanceReward(BaseReward):
    """Negative scaled distance from "pos2d" to a goal position."""

    def __init__(self, goal_position, scale: float = 1.0):
        goal = np.asarray(goal_position, dtype=np.float32)
        if goal.shape != (2,):
            raise ValueError(f"goal_position must be shape (2,), got {goal.shape}")
        self.goal_position = jnp.asarray(goal)
        self.scale = float(scale)

    def __call__(self, state: Dict):
        if "pos2d" not in state:
            raise ValueError("DistanceReward requires 'pos2d' in state dictionary")
        pos = state["pos2d"]
        distance = jnp.linalg.norm(self.goal_position - pos, axis=-1)
        return -self.scale * distance
