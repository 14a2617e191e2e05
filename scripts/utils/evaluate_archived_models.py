#!/usr/bin/env python
"""Batch re-evaluation of archived models.

Counterpart of reference scripts/utils/evaluate_archived_models.py:33 — runs
the evaluator over every archived model and stores results/evaluations.npz
per archive (timesteps x episodes reward/length matrices, the same file
EvalCallback writes during training).
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Re-evaluate archived models")
    p.add_argument("--archive-root",
                   default="outputs/experiments/archived_models")
    p.add_argument("--n-test", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    import numpy as np

    from openballbot_rl_tpu.cli.evaluate import main as eval_main

    count = 0
    for name in sorted(os.listdir(a.archive_root)
                       if os.path.isdir(a.archive_root) else []):
        d = os.path.join(a.archive_root, name)
        model = os.path.join(d, "best_model")
        if not os.path.isdir(model):
            continue
        print(f"=== {name} ===")
        res = eval_main(model, {}, n_test=a.n_test, seed=a.seed)
        os.makedirs(os.path.join(d, "results"), exist_ok=True)
        np.savez(os.path.join(d, "results", "evaluations.npz"),
                 timesteps=np.array([0]),
                 results=res["rewards"][None, :],
                 ep_lengths=res["lengths"][None, :])
        count += 1
    print(f"evaluated {count} archived model(s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
