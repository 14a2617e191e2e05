#!/usr/bin/env python
"""Render a video for every archived model.

Counterpart of reference scripts/utils/visualize_all_archived_models.py:201
(parallel GUI viewers) — sequential offline raytraced videos instead.
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Visualize all archived models")
    p.add_argument("--archive-root",
                   default="outputs/experiments/archived_models")
    p.add_argument("--episodes", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    from openballbot_rl_tpu.cli.visualize_model import main as viz_main

    count = 0
    for name in sorted(os.listdir(a.archive_root)
                       if os.path.isdir(a.archive_root) else []):
        d = os.path.join(a.archive_root, name)
        model = os.path.join(d, "best_model")
        if not os.path.isdir(model):
            continue
        print(f"=== {name} ===")
        try:
            viz_main(model, n_episodes=a.episodes, seed=a.seed,
                     out=os.path.join(d, "visualization.mp4"))
            count += 1
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED ({e})")
    print(f"rendered {count} video(s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
