#!/usr/bin/env python
"""Archive a training run into the dated experiments layout.

Counterpart of reference scripts/utils/archive_model.py:27 — copies
best_model/config.yaml/info.txt/progress.csv/results into
outputs/experiments/archived_models/<date>_<name>/ and writes a README
summarizing the run.
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
from datetime import datetime


def archive_run(run_dir: str, name: str, archive_root: str,
                date: str = "", verbose: bool = True) -> str:
    date = date or datetime.now().strftime("%Y-%m-%d")
    dest = os.path.join(archive_root, f"{date}_{name}")
    os.makedirs(dest, exist_ok=True)

    copied = []
    for item in ("config.yaml", "info.txt", "progress.csv"):
        src = os.path.join(run_dir, item)
        if os.path.exists(src):
            shutil.copy2(src, dest)
            copied.append(item)
    for tree in ("best_model", "final_model", "results"):
        src = os.path.join(run_dir, tree)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(dest, tree), dirs_exist_ok=True)
            copied.append(tree + "/")

    # summary README from progress.csv + evaluations.npz
    lines = [f"# {name}", "", f"archived: {datetime.now().isoformat()}",
             f"source run: {os.path.abspath(run_dir)}", ""]
    prog = os.path.join(run_dir, "progress.csv")
    if os.path.exists(prog):
        from openballbot_rl_tpu.viz.plots import read_progress

        data = read_progress(prog)
        steps = data.get("time/total_timesteps")
        if steps is not None and len(steps):
            lines.append(f"total timesteps: {int(steps[-1]):,}")
        ev = data.get("eval/mean_reward")
        if ev is not None:
            import numpy as np

            ev = ev[~np.isnan(ev)]
            if len(ev):
                lines.append(f"final eval reward: {ev[-1]:.2f} "
                             f"(best {ev.max():.2f} over {len(ev)} evals)")
    lines.append("")
    lines.append("contents: " + ", ".join(copied))
    with open(os.path.join(dest, "README.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    if verbose:
        print(f"archived {run_dir} -> {dest} ({', '.join(copied)})")
    return dest


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Archive a training run")
    p.add_argument("run_dir")
    p.add_argument("--name", required=True,
                   help="archive name, e.g. ppo-perlin-directional-5M-steps")
    p.add_argument("--archive-root",
                   default="outputs/experiments/archived_models")
    p.add_argument("--date", default="")
    a = p.parse_args(argv)
    archive_run(a.run_dir, a.name, a.archive_root, a.date)
    return 0


if __name__ == "__main__":
    sys.exit(main())
