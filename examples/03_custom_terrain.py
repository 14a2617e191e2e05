#!/usr/bin/env python
"""Example 03 — custom terrain generator.

(Reference: examples/03_custom_terrain.py.) A terrain generator is a pure
function f(n, **params, seed) -> (n*n,) heights in [0, 1]; registering it
makes it available to YAML configs and the factory.
"""
from openballbot_rl_tpu.utils.devices import force_cpu

force_cpu()

import jax
import jax.numpy as jnp

from openballbot_rl_tpu.core.factories import create_terrain
from openballbot_rl_tpu.core.registry import ComponentRegistry


def generate_crater_terrain(n: int, depth: float = 0.5, rim: float = 0.15,
                            seed: int = 0):
    """A crater: flat ground with a radial depression + raised rim."""
    assert n % 2 == 1, "terrain grid must be odd-sized"
    coords = jnp.linspace(-1.0, 1.0, n)
    X, Y = jnp.meshgrid(coords, coords)
    r = jnp.sqrt(X ** 2 + Y ** 2)
    crater = depth * (1.0 - jnp.exp(-(r / 0.4) ** 2))      # bowl
    rim_bump = rim * jnp.exp(-((r - 0.5) / 0.08) ** 2)     # raised ring
    h = crater + rim_bump
    h = (h - h.min()) / (h.max() - h.min() + 1e-9)
    return h.reshape(-1)


ComponentRegistry.register_terrain("crater", generate_crater_terrain)

gen = create_terrain({"type": "crater", "config": {"depth": 0.7}})
heights = gen(65, seed=3)
print(f"crater terrain: shape {heights.shape}, "
      f"range [{float(heights.min()):.3f}, {float(heights.max()):.3f}]")
