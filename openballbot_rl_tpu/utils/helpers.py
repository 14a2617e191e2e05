"""Small utilities (reference: ballbot_gym/utils/helpers.py).

`sample_direction_uniform` is the seeded JAX counterpart of the reference
helper (helpers.py:40-65, which draws from the unseeded global np.random —
here a key is explicit). The reference's `warnings_stdout_off` stderr
redirect exists to silence MuJoCo's C warnings during mj_step; there is no
C physics here, so it has no counterpart.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_direction_uniform(key, num: int = 1) -> jnp.ndarray:
    """(num, 2) unit vectors uniform on the circle ((2,) if num == 1)."""
    theta = jax.random.uniform(key, (num,), minval=0.0,
                               maxval=2.0 * jnp.pi)
    out = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return out[0] if num == 1 else out
