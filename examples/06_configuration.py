#!/usr/bin/env python
"""Example 06 — the configuration system.

(Reference: examples/06_configuration.py.) Layered YAML: a training config
points at an env config via `env_config:`; the two are recursively merged
(training values win) and terrain/reward are normalized into `problem.*`.
"""
import os
import tempfile

import yaml

from openballbot_rl_tpu.core.config import (
    get_component_config, load_config, load_training_config, merge_configs)

d = tempfile.mkdtemp(prefix="ballbot_cfg_")

env_cfg = {
    "terrain": {"type": "perlin", "config": {"scale": 25.0, "octaves": 4}},
    "reward": {"type": "directional",
               "config": {"target_direction": [0.0, 1.0]}},
    "env": {"max_ep_steps": 4000},
}
with open(os.path.join(d, "env.yaml"), "w") as f:
    yaml.safe_dump(env_cfg, f)

train_cfg = {
    "env_config": os.path.join(d, "env.yaml"),
    "total_timesteps": 1_000_000,
    "env": {"max_ep_steps": 2000},        # training override wins
}
with open(os.path.join(d, "train.yaml"), "w") as f:
    yaml.safe_dump(train_cfg, f)

merged = load_training_config(os.path.join(d, "train.yaml"))
print("merged env.max_ep_steps:", merged["env"]["max_ep_steps"])  # -> 2000
print("terrain lifted into problem.*:",
      get_component_config(merged, "terrain")["type"])            # -> perlin

# merge semantics: override wins, recursively
base = {"a": {"x": 1, "y": 2}, "b": 1}
override = {"a": {"y": 99}}
print("merge_configs:", merge_configs(base, override))
