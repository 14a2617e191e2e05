"""Training-curve plots from progress.csv (reference:
ballbot_rl/visualization/plot_training.py:20-173).

Parses the SB3-compatible progress.csv the trainer writes (cli/train.py) and
renders reward/episode-length and loss-evolution figures.
"""
from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional

import numpy as np


def read_progress(path: str) -> Dict[str, np.ndarray]:
    """progress.csv -> {column: array} (missing cells = nan)."""
    with open(path) as f:
        rows = list(csv.DictReader(f))
    if not rows:
        return {}
    cols: Dict[str, List[float]] = {}
    for r in rows:
        for k, v in r.items():
            try:
                cols.setdefault(k, []).append(float(v) if v not in ("", None)
                                              else np.nan)
            except (TypeError, ValueError):
                cols.setdefault(k, []).append(np.nan)
    return {k: np.asarray(v) for k, v in cols.items()}


def plot_training(run_dir: str, out_dir: Optional[str] = None,
                  show: bool = False) -> List[str]:
    """Render the reference's two figures: rewards/lengths + losses."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = read_progress(os.path.join(run_dir, "progress.csv"))
    if not data:
        raise FileNotFoundError(f"no progress.csv rows under {run_dir}")
    out_dir = out_dir or os.path.join(run_dir, "plots")
    os.makedirs(out_dir, exist_ok=True)
    x = data.get("time/total_timesteps")
    outs = []

    fig, axes = plt.subplots(2, 1, figsize=(9, 7), sharex=True)
    ax = axes[0]
    if "rollout/ep_rew_mean" in data:
        ax.plot(x, data["rollout/ep_rew_mean"], label="train ep reward")
    if "eval/mean_reward" in data:
        m = ~np.isnan(data["eval/mean_reward"])
        ax.plot(x[m], data["eval/mean_reward"][m], "o-", label="eval reward")
    ax.set_ylabel("reward"); ax.legend(); ax.grid(alpha=0.3)
    ax = axes[1]
    if "rollout/ep_len_mean" in data:
        ax.plot(x, data["rollout/ep_len_mean"], label="train ep length")
    if "eval/mean_ep_length" in data:
        m = ~np.isnan(data["eval/mean_ep_length"])
        ax.plot(x[m], data["eval/mean_ep_length"][m], "o-", label="eval length")
    ax.set_xlabel("timesteps"); ax.set_ylabel("episode length")
    ax.legend(); ax.grid(alpha=0.3)
    p = os.path.join(out_dir, "training_rewards.png")
    fig.tight_layout(); fig.savefig(p, dpi=120); outs.append(p)
    if show:
        plt.show()
    plt.close(fig)

    loss_keys = [k for k in data if k.startswith("train/")]
    if loss_keys:
        fig, axes = plt.subplots(len(loss_keys), 1,
                                 figsize=(9, 2.2 * len(loss_keys)),
                                 sharex=True, squeeze=False)
        for ax, k in zip(axes[:, 0], sorted(loss_keys)):
            ax.plot(x, data[k])
            ax.set_ylabel(k.split("/")[1], fontsize=8); ax.grid(alpha=0.3)
        axes[-1, 0].set_xlabel("timesteps")
        p = os.path.join(out_dir, "training_losses.png")
        fig.tight_layout(); fig.savefig(p, dpi=120); outs.append(p)
        plt.close(fig)
    return outs
