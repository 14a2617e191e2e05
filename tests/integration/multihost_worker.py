"""Worker process for the 2-process jax.distributed CPU test.

Launched by tests/integration/test_multihost.py, one subprocess per
"host"; exercises the REAL `multihost:` path in cli/train.py (explicit
coordinator_address/num_processes/process_id kwargs), the global-mesh env
sharding, the orbax checkpoint save, and three full PPO iterations. Prints
a final JSON line with the last iteration's metrics so the test can assert
the two processes computed identical (replicated) results.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from openballbot_rl_tpu.cli.train import main as train_main

    config = {
        "problem": {
            "terrain": {"type": "flat", "config": {}},
            "reward": {"type": "directional",
                       "config": {"target_direction": [0.0, 1.0]}},
        },
        "env": {"max_ep_steps": 32},
        "camera": {"enabled": False},
        "num_envs": 8,
        "terrain_bank_size": 2,
        "total_timesteps": 8 * 8 * 3,     # 3 iterations
        "algo": {"n_steps": 8, "batch_sz": 16, "n_epochs": 1},
        "evaluation": {"freq": 10 ** 9, "n_episodes": 4},
        "checkpoint_freq": 10 ** 9,
        "multihost": {
            "coordinator_address": args.coordinator,
            "num_processes": args.num_processes,
            "process_id": args.process_id,
        },
    }
    # NOTE: all processes share ONE run dir (shared filesystem) — orbax
    # multihost checkpoint saves are collective into the same path
    out_dir = train_main(config, seed=0, out_dir=args.out, verbose=False,
                         assume_yes=True)

    # this process's own view of the final replicated metrics (written by
    # train_main before the end-of-training barrier, so it exists for every
    # process here)
    with open(os.path.join(
            out_dir, f"proc{args.process_id}.metrics.json")) as f:
        mine = json.load(f)
    print("MULTIHOST_RESULT " + json.dumps({
        "process_id": args.process_id,
        "iterations": int(mine["time/iterations"]),
        "total_timesteps": int(mine["time/total_timesteps"]),
        "pg_loss": float(mine["train/policy_gradient_loss"]),
        "value_loss": float(mine["train/value_loss"]),
        "approx_kl": float(mine["train/approx_kl"]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
