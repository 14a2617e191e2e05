#!/usr/bin/env python
"""Generate training plots for every archived run.

Counterpart of reference scripts/utils/generate_training_plots.py:108.
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Plot curves for archived runs")
    p.add_argument("--archive-root",
                   default="outputs/experiments/archived_models")
    a = p.parse_args(argv)

    from openballbot_rl_tpu.viz.plots import plot_training

    count = 0
    for name in sorted(os.listdir(a.archive_root)
                       if os.path.isdir(a.archive_root) else []):
        d = os.path.join(a.archive_root, name)
        if not os.path.exists(os.path.join(d, "progress.csv")):
            continue
        try:
            outs = plot_training(d)
            print(f"{name}: {len(outs)} figure(s)")
            count += 1
        except Exception as e:  # noqa: BLE001 — keep batch going
            print(f"{name}: FAILED ({e})")
    print(f"plotted {count} archive(s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
