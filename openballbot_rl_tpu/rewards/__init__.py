"""Reward components; registered on import (mirrors ballbot_gym/rewards/__init__.py:8-9)."""
from openballbot_rl_tpu.core.registry import ComponentRegistry
from openballbot_rl_tpu.rewards.base import BaseReward
from openballbot_rl_tpu.rewards.directional import DirectionalReward
from openballbot_rl_tpu.rewards.distance import DistanceReward

if "directional" not in ComponentRegistry.list_rewards():
    ComponentRegistry.register_reward("directional", DirectionalReward)
    ComponentRegistry.register_reward("distance", DistanceReward)

__all__ = ["BaseReward", "DirectionalReward", "DistanceReward"]
