"""Characterize the perlin training-terrain distribution in physical units.

Round-3 evidence for the paper-reproduction question (VERDICT r2 task 1):
quantify what the corrected (reference-parity) perlin distribution actually
asks of the robot — height ranges, slope distribution vs the 20-degree tilt
failure budget (reference `ballbot_env.py:222`), spawn-local slopes, and clip
fraction — and contrast with the deleted round-1 distribution to explain why
a smoother-looking terrain can be *harder* (round-1 noise clipped to [0,1]
-> flat plateaus; corrected noise never clips -> continuous slopes).

Geometry (reference `ballbot_gym/models/ballbot.xml:23`): hfield 293x293,
size "5 5 2.0 0.1" -> 10x10 m extent, elevation = value * 2.0 m.
Perlin params (archived reference config): scale 25, octaves 4,
persistence 0.2, lacunarity 2.0, amplitude 1.0, seed ~ U[0,10000).

Run CPU-only:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/terrain_study.py [--seeds 64] [--json out.json]
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from openballbot_rl_tpu.utils.devices import force_cpu  # noqa: E402

force_cpu()

N = 293
EXTENT_M = 10.0
Z_SCALE_M = 2.0
CELL_M = EXTENT_M / (N - 1)
BALL_RADIUS_M = 0.12
TILT_BUDGET_DEG = 20.0


def _slope_deg(height_m: np.ndarray) -> np.ndarray:
    """Per-cell surface slope angle (degrees) via central differences."""
    gy, gx = np.gradient(height_m, CELL_M)
    return np.degrees(np.arctan(np.hypot(gx, gy)))


def _disc_mask(radius_m: float) -> np.ndarray:
    c = N // 2
    ii = (np.arange(N) - c)[:, None] * CELL_M
    jj = (np.arange(N) - c)[None, :] * CELL_M
    return ii * ii + jj * jj <= radius_m * radius_m


def _load_r1_generator():
    """Reconstruct the deleted round-1 perlin (plain 2D fBm) from git."""
    src = subprocess.run(
        ["git", "show", "4d17cb9~1:openballbot_rl_tpu/terrain/simplex.py"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))).stdout
    if not src:
        return None
    path = "/tmp/_simplex_r1.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("_simplex_r1", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import jax.numpy as jnp

    def gen(seed: int) -> np.ndarray:
        idx = jnp.arange(N, dtype=jnp.float32) / 25.0
        X, Y = jnp.meshgrid(idx, idx, indexing="ij")
        noise = mod.fbm2(X, Y, octaves=4, persistence=0.2, lacunarity=2.0,
                         base=seed)
        return np.asarray(jnp.clip((noise + 1.0) / 2.0, 0.0, 1.0))

    return gen


def stats_for(gen, seeds, label):
    ball = _disc_mask(BALL_RADIUS_M)
    near = _disc_mask(0.5)
    rows = []
    for s in seeds:
        vals = np.asarray(gen(int(s))).reshape(N, N)
        h = vals * Z_SCALE_M
        slope = _slope_deg(h)
        rows.append(dict(
            seed=int(s),
            h_min=float(h.min()), h_max=float(h.max()),
            h_mean=float(h.mean()), h_std=float(h.std()),
            clip_frac=float(np.mean((vals <= 0.0) | (vals >= 1.0))),
            flat_frac=float(np.mean(slope < 2.0)),
            slope_p50=float(np.percentile(slope, 50)),
            slope_p90=float(np.percentile(slope, 90)),
            slope_p99=float(np.percentile(slope, 99)),
            slope_max=float(slope.max()),
            over_budget_frac=float(np.mean(slope > TILT_BUDGET_DEG)),
            spawn_ball_relief_m=float(h[ball].max() - h[ball].min()),
            spawn_ball_slope_max=float(slope[ball].max()),
            spawn_halfm_slope_max=float(slope[near].max()),
            spawn_halfm_slope_mean=float(slope[near].mean()),
        ))
    agg = {k: (float(np.mean([r[k] for r in rows])),
               float(np.std([r[k] for r in rows])))
           for k in rows[0] if k != "seed"}
    print(f"\n=== {label} ({len(rows)} seeds) — mean ± std over seeds ===")
    for k, (m, sd) in agg.items():
        print(f"  {k:24s} {m:10.4f} ± {sd:.4f}")
    return dict(label=label, per_seed=rows, aggregate=agg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=64)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--amplitudes", type=float, nargs="*", default=[1.0])
    args = ap.parse_args()

    from openballbot_rl_tpu.terrain.generators import generate_perlin_terrain

    rng = np.random.default_rng(0)
    seeds = rng.integers(0, 10000, size=args.seeds)

    out = {"cell_m": CELL_M, "z_scale_m": Z_SCALE_M,
           "tilt_budget_deg": TILT_BUDGET_DEG, "studies": []}

    for amp in args.amplitudes:
        def gen(seed, _amp=amp):
            return generate_perlin_terrain(N, amplitude=_amp, seed=seed)
        out["studies"].append(
            stats_for(gen, seeds, f"corrected perlin (amplitude={amp})"))

    r1 = _load_r1_generator()
    if r1 is not None:
        out["studies"].append(stats_for(r1, seeds, "round-1 fbm2 (deleted)"))
    else:
        print("round-1 generator unavailable (git show failed)")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
