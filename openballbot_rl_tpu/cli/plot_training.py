"""`ballbot-plot-training`: plot learning curves from a run directory.

Counterpart of ballbot_rl/visualization/plot_training.py:20-173.
"""
from __future__ import annotations

import argparse
import sys


def cli_main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Plot training curves")
    p.add_argument("run_dir", help="run directory containing progress.csv")
    p.add_argument("--out", default="", help="output dir (default: "
                                             "<run_dir>/plots)")
    args = p.parse_args(argv)

    from openballbot_rl_tpu.viz.plots import plot_training

    outs = plot_training(args.run_dir, args.out or None)
    for o in outs:
        print(o)
    return 0


if __name__ == "__main__":
    sys.exit(cli_main())
