"""Config + factory semantics (mirror of reference tests/unit/test_factories.py
and core/config.py behaviors)."""
import pytest
import yaml

from openballbot_rl_tpu.core.config import (
    get_component_config, load_config, load_training_config, merge_configs)
from openballbot_rl_tpu.core.factories import validate_config
import openballbot_rl_tpu.rewards  # noqa: F401  (register)
import openballbot_rl_tpu.terrain  # noqa: F401


def test_merge_recursive():
    base = {"a": 1, "b": {"c": 2, "d": 3}}
    override = {"b": {"c": 9}, "e": 5}
    merged = merge_configs(base, override)
    assert merged == {"a": 1, "b": {"c": 9, "d": 3}, "e": 5}
    assert base["b"]["c"] == 2  # no mutation


def test_load_config_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_config(str(tmp_path / "nope.yaml"))


def test_load_config_empty(tmp_path):
    p = tmp_path / "empty.yaml"
    p.write_text("")
    assert load_config(str(p)) == {}


def test_training_config_requires_env_config(tmp_path):
    p = tmp_path / "train.yaml"
    p.write_text(yaml.dump({"algo": {"name": "ppo"}}))
    with pytest.raises(ValueError, match="env_config"):
        load_training_config(str(p))


def test_training_config_merge_and_problem_lift(tmp_path):
    env = tmp_path / "env.yaml"
    env.write_text(yaml.dump({
        "terrain": {"type": "perlin", "config": {"scale": 25.0}},
        "reward": {"type": "directional", "config": {"target_direction": [0, 1]}},
        "env": {"max_ep_steps": 4000},
    }))
    train = tmp_path / "train" / "t.yaml"
    train.parent.mkdir()
    train.write_text(yaml.dump({
        "env_config": str(env),
        "algo": {"name": "ppo"},
        "env": {"max_ep_steps": 1000},   # training overrides env config
    }))
    cfg = load_training_config(str(train))
    assert cfg["problem"]["terrain"]["type"] == "perlin"
    assert cfg["problem"]["reward"]["type"] == "directional"
    assert cfg["env"]["max_ep_steps"] == 1000
    assert "env_config" not in cfg


def test_get_component_config_variants():
    full = {"problem": {"reward": {"type": "directional",
                                   "config": {"target_direction": [0, 1]}}}}
    assert get_component_config(full, "reward")["type"] == "directional"
    # top-level fallback
    assert get_component_config({"terrain": {"type": "flat"}}, "terrain")["config"] == {}
    # string backward compat
    assert get_component_config({"terrain": "perlin"}, "terrain") == {
        "type": "perlin", "config": {}}
    # default type
    assert get_component_config({}, "terrain", default_type="flat")["type"] == "flat"
    with pytest.raises(ValueError):
        get_component_config({}, "reward")


def test_validate_config():
    assert validate_config({"type": "perlin"}, "terrain")
    assert validate_config({"type": "directional"}, "reward")
    with pytest.raises(ValueError, match="Unknown terrain"):
        validate_config({"type": "lava"}, "terrain")
    with pytest.raises(ValueError, match="'type'"):
        validate_config({}, "terrain")
    with pytest.raises(ValueError, match="component_type"):
        validate_config({"type": "x"}, "gearbox")
