"""Terrain-difficulty curriculum schedules.

A capability the reference lacks (SURVEY.md §2.4): the trainer anneals one
numeric terrain parameter over training and regenerates the terrain bank on
the fly. Two modes:

- ``linear``: value follows the clock — ``start + (end-start) *
  min(1, progress/anneal_frac)``.
- ``adaptive``: value follows demonstrated competence — promote by ``step``
  when the latest finished-episode mean length clears
  ``promote_ep_len_frac`` of the horizon, optionally demote on collapse.

Pure host-side logic; banks are rebuilt outside the jitted program.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional


@dataclasses.dataclass(frozen=True)
class CurriculumSchedule:
    param: str
    start: float = 0.0
    end: float = 1.0
    mode: str = "linear"
    anneal_frac: float = 0.7          # linear: reach `end` at this progress
    regen_every: int = 5              # bank regen cadence (iterations)
    step: Optional[float] = None      # adaptive: increment per promotion
    promote_ep_len_frac: float = 0.85
    demote_ep_len_frac: Optional[float] = None
    # adaptive: iterations between difficulty decisions; None = auto (one
    # episode span, ceil(max_ep_steps/n_steps), so every decision is based
    # on episodes that actually ran at the current difficulty)
    decide_every: Optional[int] = None

    @classmethod
    def from_config(cls, cfg: dict) -> "CurriculumSchedule":
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(cfg) - known
        if unknown:
            raise ValueError(f"unknown curriculum keys {sorted(unknown)}; "
                             f"valid: {sorted(known)}")
        kw = {k: cfg[k] for k in known if k in cfg}
        return cls(**kw)

    def _step_size(self) -> float:
        return self.step if self.step is not None \
            else (self.end - self.start) / 10.0

    def next_value(self, progress: float, value: float, ep_len: float,
                   max_ep_steps: int) -> float:
        """The difficulty to train at next.

        `progress` in [0,1] is global_step/total_timesteps; `value` is the
        current difficulty; `ep_len` the latest finished-episode mean length
        (may be NaN before any episode finishes).
        """
        if self.mode == "adaptive":
            # direction-aware: "promote" always moves toward `end`, "demote"
            # toward `start`, so descending ranges (start > end, e.g. a knob
            # where smaller = harder) step correctly instead of snapping to
            # a boundary
            direction = 1.0 if self.end >= self.start else -1.0
            step = abs(self._step_size()) * direction
            lo = min(self.start, self.end)
            hi = max(self.start, self.end)
            if math.isfinite(ep_len):
                if ep_len >= self.promote_ep_len_frac * max_ep_steps:
                    value = value + step
                elif (self.demote_ep_len_frac is not None
                      and ep_len < float(self.demote_ep_len_frac)
                      * max_ep_steps):
                    value = value - step
                value = min(hi, max(lo, value))
            return value
        if self.mode != "linear":
            raise ValueError(f"unknown curriculum mode {self.mode!r}")
        t = min(1.0, progress / max(self.anneal_frac, 1e-9))
        return self.start + (self.end - self.start) * t
