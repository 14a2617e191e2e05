"""Single-variable sweep driver: one training run per override value.

Round-3 counterpart of the reference's manual hyperparameter studies (the
paper: "tuning the clip range, entropy coefficient, epochs per updates as
well as LR scheduling were critical"). Loads a base train config, applies a
dotted-path override per sweep point, and runs each point in THIS process
(one TPU client for the whole sweep — see tools/run_on_tpu.sh).

Usage:
  tools/run_on_tpu.sh /tmp/sweep.log python scripts/utils/sweep.py \
      --config configs/train/ppo_perlin_tuned.yaml \
      --param problem.terrain.config.amplitude --values 0.1,0.2,0.35,0.5 \
      --tag amp-frontier [--seed 10] [--set total_timesteps=3e7]

Writes <out-root>/<tag>/<param-leaf>_<value>/... run dirs plus a sweep.json
summary (final/best eval reward, ep-len, survival per point).
"""
from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def set_dotted(cfg: dict, dotted: str, value) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def parse_value(s: str):
    try:
        v = float(s)
        return int(v) if v.is_integer() and ("." not in s and "e" not in s
                                             and "E" not in s) else v
    except ValueError:
        return s


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="single-variable sweep")
    p.add_argument("--config", required=True)
    p.add_argument("--param", required=True, help="dotted config path")
    p.add_argument("--values", required=True, help="comma-separated values")
    p.add_argument("--tag", required=True)
    p.add_argument("--seed", type=int, default=10)
    p.add_argument("--out-root", default="outputs/experiments/sweeps")
    p.add_argument("--set", action="append", default=[],
                   help="extra fixed override, dotted=value (repeatable)")
    args = p.parse_args(argv)

    from openballbot_rl_tpu.core.config import load_training_config
    from openballbot_rl_tpu.cli.train import main as train_main

    base = load_training_config(args.config)
    for ov in args.set:
        k, _, v = ov.partition("=")
        set_dotted(base, k, parse_value(v))

    root = os.path.join(args.out_root, args.tag)
    os.makedirs(root, exist_ok=True)
    leaf = args.param.split(".")[-1]

    rows = []
    for raw in args.values.split(","):
        value = parse_value(raw.strip())
        config = copy.deepcopy(base)
        set_dotted(config, args.param, value)
        run_dir = os.path.join(root, f"{leaf}_{raw.strip()}")
        t0 = time.time()
        train_main(config, args.seed, out_dir=run_dir, verbose=True,
                   assume_yes=True)
        ev = np.load(os.path.join(run_dir, "results", "evaluations.npz"))
        rewards = ev["results"]            # (n_evals, n_episodes)
        lengths = ev["ep_lengths"]
        mean_curve = rewards.mean(axis=1)
        horizon = int((config.get("env") or {}).get("max_ep_steps", 4000))
        rows.append({
            leaf: value,
            "final_eval": float(mean_curve[-1]),
            "best_eval": float(mean_curve.max()),
            "final_ep_len": float(lengths[-1].mean()),
            "final_survival": float((lengths[-1] >= horizon).mean()),
            "wall_s": round(time.time() - t0, 1),
        })
        print(f"[sweep] {leaf}={value}: final {rows[-1]['final_eval']:.2f} "
              f"best {rows[-1]['best_eval']:.2f} "
              f"ep_len {rows[-1]['final_ep_len']:.0f}")
        with open(os.path.join(root, "sweep.json"), "w") as f:
            json.dump({"config": args.config, "param": args.param,
                       "seed": args.seed, "overrides": args.set,
                       "points": rows}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
