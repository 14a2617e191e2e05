#!/usr/bin/env python
"""Terrain gallery: render every registered generator to one PNG grid.

(Reference: examples/terrain_visualization.py + terrain_examples.yaml.)
"""
from openballbot_rl_tpu.utils.devices import force_cpu

force_cpu()

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import yaml

import openballbot_rl_tpu  # noqa: F401 — registration
from openballbot_rl_tpu.core.factories import create_terrain
from openballbot_rl_tpu.core.registry import ComponentRegistry

HERE = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(HERE, "terrain_examples.yaml")) as f:
    PRESETS = yaml.safe_load(f)

terrains = sorted(ComponentRegistry.list_terrains())
cols = 4
rows = -(-len(terrains) // cols)
fig, axes = plt.subplots(rows, cols, figsize=(3.2 * cols, 3.0 * rows))
for ax, t in zip(axes.flat, terrains):
    cfg = (PRESETS.get(t) or {}).get("config", {})
    gen = create_terrain({"type": t, "config": cfg})
    g = np.asarray(gen(129, seed=7)).reshape(129, 129)
    im = ax.imshow(g, cmap="terrain", origin="lower", vmin=0, vmax=1)
    ax.set_title(t, fontsize=10)
    ax.set_xticks([]); ax.set_yticks([])
for ax in axes.flat[len(terrains):]:
    ax.axis("off")
fig.suptitle("terrain generators (seed 7)")
fig.tight_layout()
out = os.path.join(HERE, "terrain_gallery.png")
fig.savefig(out, dpi=110)
print("gallery ->", out)
