#!/usr/bin/env python
"""Enhance archived models: add plots, fresh evaluations, and videos.

Counterpart of reference scripts/utils/enhance_archived_models.py:226 —
one pass that brings every archive up to full fidelity (training plots +
re-evaluation npz + a rollout video).
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Enhance archived models")
    p.add_argument("--archive-root",
                   default="outputs/experiments/archived_models")
    p.add_argument("--plots", action="store_true", default=True)
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--videos", action="store_true")
    p.add_argument("--n-test", type=int, default=5)
    a = p.parse_args(argv)

    from openballbot_rl_tpu.viz.plots import plot_training

    count = 0
    for name in sorted(os.listdir(a.archive_root)
                       if os.path.isdir(a.archive_root) else []):
        d = os.path.join(a.archive_root, name)
        if not os.path.isdir(d):
            continue
        print(f"=== {name} ===")
        if a.plots and os.path.exists(os.path.join(d, "progress.csv")):
            try:
                plot_training(d)
                print("  plots ok")
            except Exception as e:  # noqa: BLE001
                print(f"  plots failed: {e}")
        model = os.path.join(d, "best_model")
        if a.evaluate and os.path.isdir(model):
            import numpy as np

            from openballbot_rl_tpu.cli.evaluate import main as eval_main

            res = eval_main(model, {}, n_test=a.n_test, verbose=False)
            os.makedirs(os.path.join(d, "results"), exist_ok=True)
            np.savez(os.path.join(d, "results", "evaluations.npz"),
                     timesteps=np.array([0]),
                     results=res["rewards"][None, :],
                     ep_lengths=res["lengths"][None, :])
            print(f"  re-eval: mean {res['mean_reward']:.2f}")
        if a.videos and os.path.isdir(model):
            from openballbot_rl_tpu.cli.visualize_model import main as viz

            try:
                viz(model, n_episodes=1,
                    out=os.path.join(d, "visualization.mp4"), verbose=False)
                print("  video ok")
            except Exception as e:  # noqa: BLE001
                print(f"  video failed: {e}")
        count += 1
    print(f"enhanced {count} archive(s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
