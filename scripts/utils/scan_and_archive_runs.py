#!/usr/bin/env python
"""Bulk-scan run directories and archive qualifying runs.

Counterpart of reference scripts/utils/scan_and_archive_runs.py:151-365 —
scans outputs/experiments/runs/, filters by minimum trained steps, archives
each qualifying run, and (re)generates an index README for the archive.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from archive_model import archive_run  # noqa: E402


def scan_runs(runs_root: str, min_steps: int):
    """Yield (run_dir, total_steps, terrain) for completed runs."""
    from openballbot_rl_tpu.viz.plots import read_progress

    for name in sorted(os.listdir(runs_root) if os.path.isdir(runs_root) else []):
        run_dir = os.path.join(runs_root, name)
        prog = os.path.join(run_dir, "progress.csv")
        if not os.path.exists(prog):
            continue
        data = read_progress(prog)
        steps = data.get("time/total_timesteps")
        total = int(steps[-1]) if steps is not None and len(steps) else 0
        if total < min_steps:
            continue
        terrain = "unknown"
        cfg = os.path.join(run_dir, "config.yaml")
        if os.path.exists(cfg):
            import yaml

            c = yaml.safe_load(open(cfg)) or {}
            terrain = ((c.get("problem", {}) or {}).get("terrain", {})
                       or {}).get("type", "unknown")
        yield run_dir, total, terrain


def generate_index(archive_root: str) -> str:
    lines = ["# Archived models", ""]
    for name in sorted(os.listdir(archive_root)
                       if os.path.isdir(archive_root) else []):
        d = os.path.join(archive_root, name)
        if not os.path.isdir(d):
            continue
        first = ""
        readme = os.path.join(d, "README.md")
        if os.path.exists(readme):
            for line in open(readme):
                if line.startswith("final eval") or line.startswith("total"):
                    first += line.strip() + "; "
        lines.append(f"- **{name}** — {first or 'no summary'}")
    idx = os.path.join(archive_root, "README.md")
    with open(idx, "w") as f:
        f.write("\n".join(lines) + "\n")
    return idx


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Scan and archive training runs")
    p.add_argument("--runs-root", default="outputs/experiments/runs")
    p.add_argument("--archive-root",
                   default="outputs/experiments/archived_models")
    p.add_argument("--min-steps", type=int, default=100_000)
    p.add_argument("--dry-run", action="store_true")
    a = p.parse_args(argv)

    count = 0
    for run_dir, total, terrain in scan_runs(a.runs_root, a.min_steps):
        label = f"ppo-{terrain}-{total // 1_000_000}M-steps" \
            if total >= 1_000_000 else f"ppo-{terrain}-{total // 1000}k-steps"
        if a.dry_run:
            print(f"would archive {run_dir} ({total:,} steps) as {label}")
        else:
            archive_run(run_dir, label, a.archive_root)
        count += 1
    if not a.dry_run and count:
        print("index ->", generate_index(a.archive_root))
    print(f"{count} run(s) {'found' if a.dry_run else 'archived'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
