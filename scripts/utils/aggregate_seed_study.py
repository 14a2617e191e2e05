"""Re-aggregate a seed-study directory's summary from its seed<k>/ runs.

Needed when seeds are added to an existing study (e.g. the round-5
completion of vision-cur02-150M-r4 from 3 to the paper's 5-seed protocol
— BASELINE.md; VERDICT r4 ask #6): seed_study.py writes the summary for
the seeds it ran, so a follow-up run of just the new seeds must rebuild
seed_study.json / seed_study.npz over ALL completed seeds.

Usage:
  python scripts/utils/aggregate_seed_study.py \
      outputs/experiments/seed_studies/<tag> [--config <cfg>]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("root", help="seed-study directory containing seed<k>/")
    p.add_argument("--config", default=None,
                   help="config path recorded in the summary (default: keep "
                        "the existing summary's, if any)")
    args = p.parse_args(argv)

    config = args.config
    summary_path = os.path.join(args.root, "seed_study.json")
    if config is None and os.path.exists(summary_path):
        with open(summary_path) as f:
            config = json.load(f).get("config")

    curves = {}
    seeds, finals, bests = [], [], []
    for d in sorted(glob.glob(os.path.join(args.root, "seed*")),
                    key=lambda s: int(re.search(r"seed(\d+)$", s).group(1))
                    if re.search(r"seed(\d+)$", s) else 1 << 30):
        m = re.search(r"seed(\d+)$", d)
        if not m:
            continue
        ev_path = os.path.join(d, "results", "evaluations.npz")
        if not os.path.exists(ev_path):
            print(f"[aggregate] {d}: no evaluations.npz, skipping")
            continue
        # a seed counts only if it trained to completion
        if not os.path.exists(os.path.join(d, "final_model.trainer.json")):
            print(f"[aggregate] {d}: no final_model, skipping (incomplete)")
            continue
        seed = int(m.group(1))
        ev = np.load(ev_path)
        mean_curve = ev["results"].mean(axis=1)
        curves[f"seed{seed}_timesteps"] = ev["timesteps"]
        curves[f"seed{seed}_results"] = ev["results"]
        curves[f"seed{seed}_ep_lengths"] = ev["ep_lengths"]
        seeds.append(seed)
        finals.append(float(mean_curve[-1]))
        bests.append(float(mean_curve.max()))
        print(f"[aggregate] seed {seed}: final {finals[-1]:.2f} "
              f"best {bests[-1]:.2f}")

    if not seeds:
        print("[aggregate] no completed seeds found")
        return 1

    summary = {
        "config": config,
        "seeds": seeds,
        "final_eval_mean": float(np.mean(finals)),
        "final_eval_std": float(np.std(finals)),
        "best_eval_mean": float(np.mean(bests)),
        "best_eval_std": float(np.std(bests)),
        "per_seed_final": finals,
        "per_seed_best": bests,
    }
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=2)
    np.savez(os.path.join(args.root, "seed_study.npz"), **curves)
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
