"""Layered YAML configuration system.

Behavioral mirror of the reference config layer (ballbot_gym/core/config.py):
  - load_config:          YAML file -> dict (empty file -> {})
  - merge_configs:        recursive merge, override wins (config.py:34-53)
  - load_training_config: training config MUST point at an env config via the
    `env_config` key; the env config is loaded, merged (training wins), and
    its terrain/reward are lifted into `problem.*` (config.py:56-135)
  - get_component_config: look under `problem.<kind>` then top level, with
    string/dict backward compat (config.py:138-197)
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import yaml


def load_config(config_path: str) -> Dict[str, Any]:
    config_file = Path(config_path)
    if not config_file.exists():
        raise FileNotFoundError(f"Configuration file not found: {config_path}")
    with config_file.open("r") as f:
        config = yaml.safe_load(f)
    return config if config is not None else {}


def merge_configs(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    merged = dict(base)
    for key, value in override.items():
        if key in merged and isinstance(merged[key], dict) and isinstance(value, dict):
            merged[key] = merge_configs(merged[key], value)
        else:
            merged[key] = value
    return merged


def load_training_config(config_path: str) -> Dict[str, Any]:
    config = load_config(config_path)

    env_config_path = config.get("env_config")
    if not env_config_path:
        raise ValueError(
            "Training config must specify 'env_config' pointing to an "
            f"environment config (got none in {config_path})")

    env_config_file = Path(env_config_path)
    if not env_config_file.is_absolute():
        if env_config_path.startswith("configs/"):
            env_config_path = str(Path.cwd() / env_config_path)
        else:
            env_config_path = str(Path(config_path).parent.parent / env_config_path)

    env_config = load_config(env_config_path)
    merged = merge_configs(env_config, config)

    merged.setdefault("problem", {})
    if "terrain" in env_config and "terrain" not in merged["problem"]:
        merged["problem"]["terrain"] = env_config["terrain"]
    if "reward" in env_config and "reward" not in merged["problem"]:
        merged["problem"]["reward"] = env_config["reward"]
    merged.pop("env_config", None)
    return merged


def get_component_config(
    config: Dict[str, Any],
    component_type: str,
    default_type: Optional[str] = None,
) -> Dict[str, Any]:
    component_config = config.get("problem", {}).get(component_type, {})
    if not component_config:
        component_config = config.get(component_type, {})

    if isinstance(component_config, str):
        return {"type": component_config, "config": {}}

    if not component_config and default_type:
        return {"type": default_type, "config": {}}

    if not isinstance(component_config, dict) or "type" not in component_config:
        if default_type:
            if isinstance(component_config, dict):
                return {"type": default_type, "config": component_config}
            return {"type": default_type, "config": {}}
        raise ValueError(
            f"Component config for '{component_type}' must have a 'type' key "
            f"or be a string, got: {component_config!r}")

    component_config.setdefault("config", {})
    return component_config
