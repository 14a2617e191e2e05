"""Training metrics logging: stdout + progress.csv + evaluations.npz.

Channel parity with the reference (SURVEY.md §5.5): SB3's CSV logger columns
(progress.csv — time/fps, rollout/ep_rew_mean, train/*, eval/*) and
EvalCallback's results/evaluations.npz (timesteps x episodes reward/length
matrices, read back by the reference's archive tooling).
"""
from __future__ import annotations

import csv
import os
import time
from typing import Dict, List, Optional

import numpy as np


class CSVLogger:
    """Append-style CSV with a stable, growing column set (SB3-like)."""

    def __init__(self, path: str):
        self.path = path
        self.fields: List[str] = []
        self.rows: List[Dict] = []
        if os.path.exists(path):  # resuming into an existing run dir
            with open(path, newline="") as f:
                reader = csv.DictReader(f)
                self.fields = list(reader.fieldnames or [])
                self.rows = [{k: v for k, v in r.items() if v not in ("", None)}
                             for r in reader]

    def truncate(self, step: int) -> None:
        """Drop rows past `step` (resume from an earlier checkpoint)."""
        self.rows = [r for r in self.rows
                     if float(r.get("time/total_timesteps", 0)) <= step]

    def log(self, row: Dict[str, float]) -> None:
        self.rows.append(dict(row))
        for k in row:
            if k not in self.fields:
                self.fields.append(k)
        with open(self.path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self.fields)
            w.writeheader()
            for r in self.rows:
                w.writerow(r)


class EvalLog:
    """results/evaluations.npz accumulator (SB3 EvalCallback format)."""

    def __init__(self, out_dir: str):
        self.dir = out_dir
        self.timesteps: List[int] = []
        self.results: List[np.ndarray] = []
        self.ep_lengths: List[np.ndarray] = []
        prior = os.path.join(out_dir, "evaluations.npz")
        if os.path.exists(prior):  # resuming into an existing run dir
            d = np.load(prior)
            self.timesteps = [int(t) for t in d["timesteps"]]
            self.results = list(d["results"])
            self.ep_lengths = list(d["ep_lengths"])

    def truncate(self, step: int) -> None:
        """Drop evals past `step` (resume from an earlier checkpoint)."""
        keep = [i for i, t in enumerate(self.timesteps) if t <= step]
        self.timesteps = [self.timesteps[i] for i in keep]
        self.results = [self.results[i] for i in keep]
        self.ep_lengths = [self.ep_lengths[i] for i in keep]

    def best_mean(self) -> float:
        """Best recorded eval mean (seeds best-model tracking on resume)."""
        if not self.results:
            return float("-inf")
        return max(float(np.mean(r)) for r in self.results)

    def add(self, timestep: int, rewards: np.ndarray, lengths: np.ndarray) -> None:
        self.timesteps.append(int(timestep))
        self.results.append(np.asarray(rewards))
        self.ep_lengths.append(np.asarray(lengths))
        os.makedirs(self.dir, exist_ok=True)
        np.savez(os.path.join(self.dir, "evaluations.npz"),
                 timesteps=np.asarray(self.timesteps),
                 results=np.stack(self.results),
                 ep_lengths=np.stack(self.ep_lengths))


class Stopwatch:
    def __init__(self):
        self.t0 = time.time()
        self.last = self.t0
        self.last_steps = 0

    def fps(self, global_step: int) -> float:
        now = time.time()
        dt = max(now - self.last, 1e-9)
        fps = (global_step - self.last_steps) / dt
        self.last = now
        self.last_steps = global_step
        return fps

    def elapsed(self) -> float:
        return time.time() - self.t0
