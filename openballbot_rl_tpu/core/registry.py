"""Component registry: names -> pure functions / component classes.

TPU-first counterpart of the reference's ComponentRegistry
(ballbot_gym/core/registry.py:8-231). The same four component kinds are
supported (rewards, terrains, policies, sensors) with the same duplicate-name
and unknown-name error behavior, but entries are *pure functions* (or factory
callables returning pure functions) that get resolved to concrete function
references at config time — before jit tracing — rather than stateful objects.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List


class ComponentRegistry:
    """Class-level registries, mirroring reference semantics (registry.py:8)."""

    _rewards: Dict[str, Callable] = {}
    _terrains: Dict[str, Callable] = {}
    _policies: Dict[str, Any] = {}
    _sensors: Dict[str, Any] = {}

    # ---- generic helpers ----
    @classmethod
    def _register(cls, table: Dict, kind: str, name: str, fn) -> None:
        if not isinstance(name, str) or not name:
            raise ValueError(f"{kind} name must be a non-empty string, got {name!r}")
        if name in table:
            raise ValueError(f"{kind} '{name}' is already registered")
        if not callable(fn):
            raise TypeError(f"{kind} '{name}' must be callable, got {type(fn)}")
        table[name] = fn

    @classmethod
    def _get(cls, table: Dict, kind: str, name: str):
        if name not in table:
            raise ValueError(
                f"Unknown {kind} '{name}'. Available: {sorted(table)}")
        return table[name]

    # ---- rewards ----
    @classmethod
    def register_reward(cls, name: str, fn: Callable) -> None:
        cls._register(cls._rewards, "reward", name, fn)

    @classmethod
    def get_reward(cls, name: str, **kwargs):
        """Return the reward entry; kwargs are passed to its factory."""
        return cls._get(cls._rewards, "reward", name)(**kwargs)

    @classmethod
    def list_rewards(cls) -> List[str]:
        return sorted(cls._rewards)

    # ---- terrains ----
    @classmethod
    def register_terrain(cls, name: str, fn: Callable) -> None:
        cls._register(cls._terrains, "terrain", name, fn)

    @classmethod
    def get_terrain(cls, name: str) -> Callable:
        return cls._get(cls._terrains, "terrain", name)

    @classmethod
    def list_terrains(cls) -> List[str]:
        return sorted(cls._terrains)

    # ---- policies ----
    @classmethod
    def register_policy(cls, name: str, policy) -> None:
        cls._register(cls._policies, "policy", name, policy)

    @classmethod
    def get_policy(cls, name: str):
        return cls._get(cls._policies, "policy", name)

    @classmethod
    def list_policies(cls) -> List[str]:
        return sorted(cls._policies)

    # ---- sensors ----
    @classmethod
    def register_sensor(cls, name: str, sensor) -> None:
        cls._register(cls._sensors, "sensor", name, sensor)

    @classmethod
    def get_sensor(cls, name: str):
        return cls._get(cls._sensors, "sensor", name)

    @classmethod
    def list_sensors(cls) -> List[str]:
        return sorted(cls._sensors)

    # ---- test support (registry.py:226) ----
    @classmethod
    def clear(cls) -> None:
        cls._rewards.clear()
        cls._terrains.clear()
        cls._policies.clear()
        cls._sensors.clear()
