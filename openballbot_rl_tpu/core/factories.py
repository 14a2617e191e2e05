"""Factories: config dicts -> concrete components.

Mirrors the reference factory behavior (ballbot_gym/core/factories.py:9-215):
per-type kwarg filtering for rewards (directional requires `target_direction`,
distance requires `goal_position`; unknown types pass config through), terrain
factories return a closure that merges config with runtime overrides (seed),
and `validate_config` checks names against the registry.

The returned components are *pure functions* suitable for closing over in
jitted code:
  - reward:  fn(state_dict) -> scalar (jnp)
  - terrain: fn(n, seed=..., **overrides) -> (n*n,) array in [0, 1]
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import numpy as np

from openballbot_rl_tpu.core.registry import ComponentRegistry


def create_reward(config: Dict[str, Any]):
    if not isinstance(config, dict):
        raise ValueError(f"Reward config must be a dictionary, got {type(config)}")
    reward_type = config.get("type")
    if reward_type is None:
        raise ValueError("Reward config must have 'type' key")
    reward_config = config.get("config", {})

    if reward_type == "directional":
        if "target_direction" not in reward_config:
            raise ValueError("DirectionalReward requires 'target_direction' in config")
        target = np.asarray(reward_config["target_direction"], dtype=np.float32)
        kwargs = {"target_direction": target}
    elif reward_type == "distance":
        if "goal_position" not in reward_config:
            raise ValueError("DistanceReward requires 'goal_position' in config")
        goal = np.asarray(reward_config["goal_position"], dtype=np.float32)
        kwargs = {"goal_position": goal, "scale": reward_config.get("scale", 1.0)}
    else:
        kwargs = dict(reward_config)

    try:
        return ComponentRegistry.get_reward(reward_type, **kwargs)
    except ValueError as e:
        raise ValueError(f"Failed to create reward '{reward_type}': {e}")
    except TypeError as e:
        raise TypeError(
            f"Failed to create reward '{reward_type}' with parameters "
            f"{sorted(kwargs)}: {e}")


def create_terrain(config: Dict[str, Any]) -> Callable:
    if not isinstance(config, dict):
        raise ValueError(f"Terrain config must be a dictionary, got {type(config)}")
    terrain_type = config.get("type")
    if terrain_type is None:
        raise ValueError("Terrain config must have 'type' key")
    terrain_config = config.get("config", {})

    try:
        terrain_fn = ComponentRegistry.get_terrain(terrain_type)
    except ValueError as e:
        raise ValueError(f"Failed to get terrain '{terrain_type}': {e}")

    def configured_terrain(n: int, **override_kwargs):
        final_config = {**terrain_config, **override_kwargs}
        return terrain_fn(n, **final_config)

    # metadata for consumers that can specialize (e.g. the native host-side
    # bank generator keys off terrain_type == "perlin")
    configured_terrain.terrain_type = terrain_type
    configured_terrain.terrain_config = dict(terrain_config)
    return configured_terrain


def create_policy(config: Dict[str, Any]):
    if not isinstance(config, dict):
        raise ValueError(f"Policy config must be a dictionary, got {type(config)}")
    policy_type = config.get("type")
    if policy_type is None:
        raise ValueError("Policy config must have 'type' key")
    try:
        return ComponentRegistry.get_policy(policy_type)
    except ValueError as e:
        raise ValueError(f"Failed to get policy '{policy_type}': {e}")


def validate_config(config: Dict[str, Any], component_type: str) -> bool:
    if not isinstance(config, dict):
        raise ValueError(f"Config must be a dictionary, got {type(config)}")
    if "type" not in config:
        raise ValueError(f"{component_type} config must have 'type' key")

    listers = {
        "reward": ComponentRegistry.list_rewards,
        "terrain": ComponentRegistry.list_terrains,
        "policy": ComponentRegistry.list_policies,
    }
    if component_type not in listers:
        raise ValueError(
            f"Unknown component_type '{component_type}'. "
            "Must be one of: 'reward', 'terrain', 'policy'")
    available = listers[component_type]()
    if config["type"] not in available:
        raise ValueError(
            f"Unknown {component_type} type '{config['type']}'. "
            f"Available: {available}")
    return True
