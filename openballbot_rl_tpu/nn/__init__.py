"""Policy / value networks (flax).

Importing registers the standard policy architectures in the
ComponentRegistry (the reference's import side effect,
ballbot_rl/policies/__init__.py:8), making them YAML-addressable through
`policy: {type: ..., config: ...}`.
"""
from openballbot_rl_tpu.nn.networks import (
    ActorCritic, DepthEncoder, Extractor, MLPHead, gaussian_entropy,
    gaussian_log_prob, sample_action)


def _register() -> None:
    from openballbot_rl_tpu.core.registry import ComponentRegistry

    for name, cls in (("actor_critic", ActorCritic), ("mlp", ActorCritic)):
        try:
            ComponentRegistry.register_policy(name, cls)
        except ValueError:
            pass        # already registered (repeated import)


_register()
del _register

__all__ = ["ActorCritic", "DepthEncoder", "Extractor", "MLPHead",
           "gaussian_entropy", "gaussian_log_prob", "sample_action"]
