"""Learning-rate schedules (mirror of ballbot_rl/training/schedules.py:4-19)."""
from __future__ import annotations

import jax.numpy as jnp


def lr_schedule(progress_remaining):
    """Piecewise-constant manual decay on progress remaining in [0, 1]:
    > 0.7 -> 1e-4, 0.5..0.7 -> 5e-5, else 1e-5 (paper's "manually scheduled")."""
    pr = jnp.asarray(progress_remaining, jnp.float32)
    return jnp.where(pr > 0.7, 1e-4, jnp.where(pr > 0.5, 5e-5, 1e-5))
