"""Reward base interface (mirrors ballbot_gym/rewards/base.py:7-21)."""
from __future__ import annotations

import abc
from typing import Dict


class BaseReward(abc.ABC):
    """A reward component: a pure callable state -> scalar.

    Implementations must be jit-traceable: constant parameters are stored at
    construction, `__call__` uses only jnp ops on the state dict values.
    """

    @abc.abstractmethod
    def __call__(self, state: Dict) -> float:
        ...
