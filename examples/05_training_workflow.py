#!/usr/bin/env python
"""Example 05 — the full training workflow, programmatically.

(Reference: examples/05_training_workflow.py.) Config -> train -> evaluate ->
plot, all through the library API (the CLIs wrap exactly these calls).
"""
from openballbot_rl_tpu.utils.devices import force_cpu

force_cpu()

import tempfile

config = {
    "env_config": None,                  # inline problem instead of a file
    "problem": {
        "terrain": {"type": "flat", "config": {}},
        "reward": {"type": "directional",
                   "config": {"target_direction": [0.0, 1.0]}},
    },
    "env": {"max_ep_steps": 100},
    "num_envs": 8,
    "total_timesteps": 1024,
    "terrain_bank_size": 2,
    "algo": {"n_steps": 32, "batch_sz": 64, "n_epochs": 1},
    "evaluation": {"freq": 512, "n_episodes": 2},
}

from openballbot_rl_tpu.cli.evaluate import main as eval_main
from openballbot_rl_tpu.cli.train import main as train_main
from openballbot_rl_tpu.viz.plots import plot_training

out = tempfile.mkdtemp(prefix="ballbot_example_run_")
run_dir = train_main(config, seed=7, out_dir=out, assume_yes=True)
print("trained ->", run_dir)

res = eval_main(f"{run_dir}/best_model", {}, n_test=2, seed=0)
print(f"eval: mean reward {res['mean_reward']:.3f}")

figs = plot_training(run_dir)
print("plots:", figs)
