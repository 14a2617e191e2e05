"""Multi-seed robustness study: run one training config across N seeds.

The paper reports 5-seed curves (Salehi2025 SsV); the reference repo's
archived runs are all single-seed, and so were this repo's round-1 runs.
This driver runs the SAME process for every seed (one TPU client for the
whole study — separate processes would churn the axon relay handshake),
then aggregates eval curves into mean +/- std and writes:

  <out-root>/<tag>/seed<k>/...            # normal run dirs
  <out-root>/<tag>/seed_study.json        # summary stats
  <out-root>/<tag>/seed_study.npz         # stacked eval curves

Usage:
  tools/run_on_tpu.sh /tmp/study.log python scripts/utils/seed_study.py \
      --config configs/train/ppo_flat_tpu.yaml --seeds 0,1,2,3,4 --tag flat20M
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# runnable as `python scripts/utils/seed_study.py` from the repo root
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="N-seed training study")
    p.add_argument("--config", required=True)
    p.add_argument("--seeds", default="0,1,2,3,4",
                   help="comma-separated seed list")
    p.add_argument("--out-root", default="outputs/experiments/seed_studies")
    p.add_argument("--tag", required=True)
    p.add_argument("--set", action="append", default=[],
                   help="config override, dotted=value (repeatable), e.g. "
                        "--set problem.terrain.config.amplitude=0.1")
    args = p.parse_args(argv)

    from openballbot_rl_tpu.core.config import load_training_config
    from openballbot_rl_tpu.cli.train import main as train_main

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sweep import parse_value, set_dotted

    seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
    root = os.path.join(args.out_root, args.tag)
    os.makedirs(root, exist_ok=True)

    curves = {}
    finals, bests, wall = [], [], []
    for seed in seeds:
        config = load_training_config(args.config)
        for ov in args.set:
            k, _, v = ov.partition("=")
            set_dotted(config, k, parse_value(v))
        run_dir = os.path.join(root, f"seed{seed}")
        t0 = time.time()
        train_main(config, seed, out_dir=run_dir, verbose=True,
                   assume_yes=True)
        wall.append(time.time() - t0)
        ev = np.load(os.path.join(run_dir, "results", "evaluations.npz"))
        mean_curve = ev["results"].mean(axis=1)
        curves[f"seed{seed}_timesteps"] = ev["timesteps"]
        curves[f"seed{seed}_results"] = ev["results"]
        curves[f"seed{seed}_ep_lengths"] = ev["ep_lengths"]
        finals.append(float(mean_curve[-1]))
        bests.append(float(mean_curve.max()))
        print(f"[seed_study] seed {seed}: final {finals[-1]:.2f} "
              f"best {bests[-1]:.2f} wall {wall[-1]:.0f}s", flush=True)

    summary = {
        "config": args.config,
        "seeds": seeds,
        "final_eval_mean": float(np.mean(finals)),
        "final_eval_std": float(np.std(finals)),
        "best_eval_mean": float(np.mean(bests)),
        "best_eval_std": float(np.std(bests)),
        "per_seed_final": finals,
        "per_seed_best": bests,
        "wall_s": wall,
    }
    with open(os.path.join(root, "seed_study.json"), "w") as f:
        json.dump(summary, f, indent=2)
    np.savez(os.path.join(root, "seed_study.npz"), **curves)
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
