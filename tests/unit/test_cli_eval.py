"""Eval-config resolution for ballbot-eval.

Regression: the run config stores components under problem.* and
get_component_config prefers problem.* over top level, so an eval config's
top-level terrain override used to lose silently to the run's entry
(reference terrain priority: evaluate.py:51-76 — CLI > eval cfg > run cfg).
"""
import pytest

from openballbot_rl_tpu.cli.evaluate import resolve_eval_config

RUN_CFG = {
    "problem": {
        "terrain": {"type": "perlin", "config": {"amplitude": 0.15}},
        "reward": {"type": "directional",
                   "config": {"target_direction": [0.0, 1.0], "scale": 0.01}},
    },
    "terrain": {"type": "perlin", "config": {"amplitude": 0.15}},
    "env": {"max_ep_steps": 4000},
    "camera": {"enabled": False},
}


@pytest.mark.unit
def test_eval_config_terrain_overrides_run_problem():
    eval_cfg = {"terrain": {"type": "perlin", "config": {"amplitude": 0.08}}}
    merged = resolve_eval_config(eval_cfg, RUN_CFG)
    assert merged["problem"]["terrain"]["config"]["amplitude"] == 0.08
    # run-config fields not mentioned by the eval config survive
    assert merged["env"]["max_ep_steps"] == 4000
    assert merged["problem"]["reward"]["config"]["scale"] == 0.01


@pytest.mark.unit
def test_eval_config_problem_nested_override():
    eval_cfg = {"problem": {"terrain": {"type": "flat", "config": {}}}}
    merged = resolve_eval_config(eval_cfg, RUN_CFG)
    assert merged["problem"]["terrain"]["type"] == "flat"


@pytest.mark.unit
def test_cli_terrain_beats_eval_config():
    eval_cfg = {"terrain": {"type": "perlin", "config": {"amplitude": 0.08}}}
    merged = resolve_eval_config(eval_cfg, RUN_CFG, terrain="flat")
    assert merged["problem"]["terrain"] == {"type": "flat", "config": {}}


@pytest.mark.unit
def test_no_eval_config_keeps_run_terrain():
    merged = resolve_eval_config({}, RUN_CFG)
    assert merged["problem"]["terrain"]["config"]["amplitude"] == 0.15


@pytest.mark.unit
def test_no_run_config():
    eval_cfg = {"terrain": {"type": "bowl", "config": {}}}
    merged = resolve_eval_config(eval_cfg, {})
    assert merged["problem"]["terrain"]["type"] == "bowl"


@pytest.mark.unit
def test_run_config_mutation_isolated():
    run = {"problem": {"terrain": {"type": "perlin", "config": {}}}}
    eval_cfg = {"terrain": {"type": "flat", "config": {}}}
    merged = resolve_eval_config(eval_cfg, run)
    assert run["problem"]["terrain"]["type"] == "perlin"
    assert merged["problem"]["terrain"]["type"] == "flat"
