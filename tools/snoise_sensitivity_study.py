"""Bound the provenance risk of the vendored snoise2 oracle (round-3 task).

All perlin parity rests on tools/vendored_snoise.py, a from-memory
float32 reconstruction of caseman/noise `_simplex.c` with no C source or
wheel available to diff against (no egress). The residual risk concentrates
in the tiled path's `fast_sin` parabola approximation: if the real library
rounds a few ULP differently, every torus coordinate — and hence every
terrain value — moves. This study measures how much the TERRAIN
DISTRIBUTION can move under worst-case few-ULP fast_sin error:

  1. +-1 and +-2 ULP perturbations of every fast_sin output;
  2. the distributed-form polynomial evaluation `3.1*y + 3.6*y*|y|`
     (the other published factoring of the devmaster parabola — same reals,
     different float rounding);
  3. a float64-evaluated polynomial (upper bound: ALL rounding error gone).

For each variant it reports terrain height deltas, slope-distribution
deltas, histogram distance and spawn-offset deltas over N seeds, plus the
two load-bearing STRUCTURAL claims, verified directly:

  * 1024-periodicity: snoise2(x + 1024, y) == snoise2(x, y) on the tiled
    path (the repeat parameters define the torus period);
  * 4D routing signature: the tiled path's single-octave value spread is
    that of 4D simplex noise (std ~0.21-0.27), far from the 2D path's
    (~0.26-0.33 with different range), and decorrelates from the 2D path.

Run CPU-only:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/snoise_sensitivity_study.py [--seeds 16] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
import vendored_snoise as vs  # noqa: E402

F32 = np.float32
N = 293
CELL_M = 10.0 / (N - 1)
Z_SCALE_M = 2.0

_orig_fast_sin = vs.fast_sin


def _ulp_variant(k: int):
    def f(x):
        y = _orig_fast_sin(x)
        out = y
        for _ in range(abs(k)):
            out = np.nextafter(out, np.float32(np.inf) if k > 0
                               else np.float32(-np.inf)).astype(F32)
        return out
    return f


def _distributed_poly(x):
    """Same parabola, distributed evaluation order (published variant)."""
    x = np.asarray(x)
    x = (x.astype(np.float64) * vs._M_1_PI).astype(F32)
    z = (x + F32(25165824.0)).astype(F32)
    x = (x - (z - F32(25165824.0))).astype(F32)
    y = (x - x * np.abs(x)).astype(F32)
    return (F32(3.1) * y + F32(3.6) * y * np.abs(y)).astype(F32)


def _float64_poly(x):
    """All float32 rounding error removed (upper bound on rounding impact)."""
    x = np.asarray(x).astype(np.float64) * vs._M_1_PI
    x = x - np.round(x / 2.0) * 2.0
    y = x - x * np.abs(x)
    return (y * (3.1 + 3.6 * np.abs(y))).astype(F32)


VARIANTS = {
    "+1ulp": _ulp_variant(+1),
    "-1ulp": _ulp_variant(-1),
    "+2ulp": _ulp_variant(+2),
    "distributed_poly": _distributed_poly,
    "float64_poly": _float64_poly,
}


def _slope_deg(height_m: np.ndarray) -> np.ndarray:
    gy, gx = np.gradient(height_m, CELL_M)
    return np.degrees(np.arctan(np.hypot(gx, gy)))


def _terrain(seed: int) -> np.ndarray:
    return vs.generate_perlin_terrain_oracle(N, seed=seed).reshape(N, N)


def _stats(vals: np.ndarray) -> dict:
    h = vals * Z_SCALE_M
    slope = _slope_deg(h)
    c = N // 2
    return dict(
        h_mean=float(h.mean()), h_std=float(h.std()),
        slope_p50=float(np.percentile(slope, 50)),
        slope_p90=float(np.percentile(slope, 90)),
        spawn_off=float(h[c - 6:c + 7, c - 6:c + 7].max()),
        hist=np.histogram(vals, bins=64, range=(0.0, 1.0), density=True)[0],
    )


def study_perturbations(seeds) -> dict:
    base = {int(s): _terrain(int(s)) for s in seeds}
    base_stats = {s: _stats(v) for s, v in base.items()}
    out = {}
    for name, fn in VARIANTS.items():
        vs.fast_sin = fn
        try:
            rows = []
            for s, b in base.items():
                v = _terrain(s)
                st, bst = _stats(v), base_stats[s]
                rows.append(dict(
                    max_abs_height_delta_m=float(
                        np.max(np.abs(v - b)) * Z_SCALE_M),
                    h_mean_delta=abs(st["h_mean"] - bst["h_mean"]),
                    h_std_delta=abs(st["h_std"] - bst["h_std"]),
                    slope_p50_delta=abs(st["slope_p50"] - bst["slope_p50"]),
                    slope_p90_delta=abs(st["slope_p90"] - bst["slope_p90"]),
                    spawn_off_delta_m=abs(st["spawn_off"] - bst["spawn_off"]),
                    hist_l1=float(np.abs(st["hist"] - bst["hist"]).sum()
                                  / 64.0),
                ))
            out[name] = {k: float(np.max([r[k] for r in rows]))
                         for k in rows[0]}
            print(f"[{name}] worst over {len(rows)} seeds: "
                  + json.dumps(out[name]))
        finally:
            vs.fast_sin = _orig_fast_sin
    return out


def study_structure() -> dict:
    """The two load-bearing structural claims, verified directly."""
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 200, 4096)
    y = rng.uniform(0, 200, 4096)
    a = vs.snoise2(x, y, octaves=1, repeatx=1024, repeaty=1024, base=5.0)
    b = vs.snoise2(x + 1024.0, y, octaves=1, repeatx=1024, repeaty=1024,
                   base=5.0)
    c = vs.snoise2(x, y + 1024.0, octaves=1, repeatx=1024, repeaty=1024,
                   base=5.0)
    period_dx = float(np.max(np.abs(a - b)))
    period_dy = float(np.max(np.abs(a - c)))

    flat = vs.snoise2(x, y, octaves=1, base=5.0)
    tiled_std = float(np.std(a))
    flat_std = float(np.std(flat))
    corr = float(np.corrcoef(a, flat)[0, 1])
    out = dict(period_dx=period_dx, period_dy=period_dy,
               tiled_std=tiled_std, flat_std=flat_std,
               tiled_flat_corr=corr,
               tiled_absmax=float(np.max(np.abs(a))),
               flat_absmax=float(np.max(np.abs(flat))))
    print("[structure] " + json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=16)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    rng = np.random.default_rng(1)
    seeds = rng.integers(0, 10000, size=args.seeds)
    result = {"perturbations": study_perturbations(seeds),
              "structure": study_structure()}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
