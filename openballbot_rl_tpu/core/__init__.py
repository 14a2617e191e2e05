from openballbot_rl_tpu.core.registry import ComponentRegistry
from openballbot_rl_tpu.core.config import (
    load_config, merge_configs, load_training_config, get_component_config)
from openballbot_rl_tpu.core.factories import (
    create_reward, create_terrain, create_policy, validate_config)

__all__ = [
    "ComponentRegistry", "load_config", "merge_configs",
    "load_training_config", "get_component_config",
    "create_reward", "create_terrain", "create_policy", "validate_config",
]
