"""Generate the perlin/snoise2 golden table from the vendored oracle.

Writes tests/golden/perlin_oracle_table.npz: terrain arrays produced by
tools/vendored_snoise.py (the NumPy reimplementation of the C `noise`
package) for a grid of seeds and parameter variants, including the exact
training distribution (scale 25, octaves 4, persistence 0.2, lacunarity 2.0,
n=293). tests/integration/test_reference_terrain_parity.py asserts both the
oracle (drift guard) and the JAX/native generators against this table.

Run once after any intended change to the vendored oracle:
    python tools/make_perlin_golden.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from vendored_snoise import generate_perlin_terrain_oracle, snoise2  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "tests", "golden", "perlin_oracle_table.npz")

CASES = [
    # (key, n, kwargs) — perlin terrain variants
    ("perlin_n65_s0", 65, {"seed": 0}),
    ("perlin_n65_s7", 65, {"seed": 7}),
    ("perlin_n65_s123", 65, {"seed": 123}),
    ("perlin_n65_s9999", 65, {"seed": 9999}),
    ("perlin_n65_s7_oct6", 65, {"seed": 7, "octaves": 6, "persistence": 0.5}),
    ("perlin_n65_s7_scale10", 65, {"seed": 7, "scale": 10.0}),
    ("perlin_n65_s7_amp015", 65, {"seed": 7, "amplitude": 0.15}),
    ("perlin_n293_s42", 293, {"seed": 42}),  # the real hfield size
]


def main() -> int:
    table = {}
    for key, n, kw in CASES:
        table[key] = generate_perlin_terrain_oracle(n, **kw).astype(np.float64)
    # raw snoise2 values, untiled path (gradient-perlin's consumption)
    idx = np.arange(65, dtype=np.float64) / 25.0
    X, Y = np.meshgrid(idx, idx, indexing="ij")
    for seed in (0, 42):
        table[f"snoise2_untiled_oct3_p03_s{seed}"] = snoise2(
            X, Y, octaves=3, persistence=0.3, base=seed).astype(np.float64)
    np.savez_compressed(OUT, **table)
    tot = sum(v.size for v in table.values())
    print(f"wrote {OUT}: {len(table)} arrays, {tot} values")
    return 0


if __name__ == "__main__":
    sys.exit(main())
