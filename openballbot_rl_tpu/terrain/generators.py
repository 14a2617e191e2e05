"""The 13 terrain generators as pure, jit-able JAX functions.

Behavioral ports of the reference generator family
(ballbot_gym/terrain/*.py — see each function's citation): same parameters,
same output contract `f(n, **params, seed) -> (n*n,) float array in [0, 1]`
(n odd), but written as vectorized array ops instead of Python double loops so
they can run under jit on TPU (terrain banks are regenerated on-device).

Value parity with the reference is verified element-wise across seeds and
parameter variants (tests/integration/test_reference_terrain_parity.py),
including the reference's quirks: stepped's order-dependent in-place
smoothing sweep (reproduced as a row/column scan recurrence), hills' MT19937
rejection-sampled placement (reproduced via a host callback), and terraced's
absolute-vs-relative transition-width unit mismatch. `perlin` and the
gradient generator's perlin mode are parity-tested against the vendored
NumPy oracle of the C `noise` package (tools/vendored_snoise.py) plus a
committed golden table, since the C extension itself is not installable
here — see docs/design/parity.md for the provenance caveat.
"""
from __future__ import annotations

import math

import numpy as np
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from openballbot_rl_tpu.terrain.simplex import snoise2_fbm, snoise2_tiled_fbm


def _check_odd(n: int) -> None:
    assert n % 2 == 1, "n should be odd for heightfield symmetry"


def _minmax_normalize(t: jnp.ndarray) -> jnp.ndarray:
    lo, hi = jnp.min(t), jnp.max(t)
    return jnp.where(hi > lo, (t - lo) / jnp.where(hi > lo, hi - lo, 1.0),
                     jnp.zeros_like(t))


def _smoothstep(edge0, edge1, x):
    x = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return x * x * (3.0 - 2.0 * x)


def _grid01(n: int):
    c = jnp.linspace(0.0, 1.0, n)
    return jnp.meshgrid(c, c, indexing="ij")


def _grid_pm1(n: int):
    center = n // 2
    c = (jnp.arange(n) - center) / center
    return jnp.meshgrid(c, c, indexing="ij")


# --------------------------------------------------------------------------
# perlin (terrain/perlin.py:8-74)
# --------------------------------------------------------------------------
def generate_perlin_terrain(n: int, scale: float = 25.0, octaves: int = 4,
                            persistence: float = 0.2, lacunarity: float = 2.0,
                            amplitude: float = 1.0, seed=0) -> jnp.ndarray:
    """The reference's training terrain: snoise2 with repeatx=repeaty=1024
    and base=seed (perlin.py:50-66) — i.e. the C library's TILED path, fBm
    over 4D simplex noise on a torus. `seed` may be traced (per-episode
    draws); the grid coordinates are static and embedded host-side."""
    _check_odd(n)
    idx = np.arange(n, dtype=np.float64) / float(scale)  # x = i/scale
    X, Y = np.meshgrid(idx, idx, indexing="ij")
    noise = snoise2_tiled_fbm(X, Y, octaves=octaves, persistence=persistence,
                              lacunarity=lacunarity, repeatx=1024.0,
                              repeaty=1024.0, base=seed)
    terrain = jnp.clip((noise + 1.0) / 2.0 * amplitude, 0.0, 1.0)
    return terrain.reshape(-1)


# --------------------------------------------------------------------------
# stepped (terrain/stepped.py:6-67)
# --------------------------------------------------------------------------
def generate_stepped_terrain(n: int, num_steps: int = 5, step_height: float = 0.1,
                             seed=None) -> jnp.ndarray:
    _check_odd(n)
    assert num_steps > 0 and step_height > 0
    step_size = n // num_steps
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    step_idx = jnp.minimum(i // step_size + j // step_size, num_steps - 1)
    terrain = step_idx.astype(jnp.float32) * step_height
    # Sequential in-place (Gauss-Seidel) neighbor smoothing, row-major —
    # stepped.py:48-57 updates terrain[i, j] using ALREADY-SMOOTHED up/left
    # neighbors; reproduced with a row scan over a column scan for parity.
    def row_step(h_prev, rows):
        t_i, t_ip1 = rows

        def col_step(h_left, xs):
            t_ij, h_up, t_down, t_right = xs
            h_ij = 0.7 * t_ij + 0.3 * (h_up + t_down + h_left + t_right) / 4.0
            return h_ij, h_ij

        xs = (t_i[1:-1], h_prev[1:-1], t_ip1[1:-1], t_i[2:])
        _, inner = jax.lax.scan(col_step, t_i[0], xs)
        new_row = jnp.concatenate([t_i[:1], inner, t_i[-1:]])
        return new_row, new_row

    _, smoothed = jax.lax.scan(row_step, terrain[0],
                               (terrain[1:-1], terrain[2:]))
    terrain = jnp.concatenate([terrain[:1], smoothed, terrain[-1:]], axis=0)
    return _minmax_normalize(terrain).reshape(-1)


# --------------------------------------------------------------------------
# ramp (terrain/ramp.py:17-173)
# --------------------------------------------------------------------------
def generate_ramp_terrain(n: int, ramp_angle: float = 15.0,
                          ramp_direction: str = "x", flat_ratio: float = 0.3,
                          num_ramps: int = 1, transition_smoothness: float = 0.5,
                          seed=None) -> jnp.ndarray:
    _check_odd(n)
    assert 0 <= ramp_angle <= 45 and 0 <= flat_ratio <= 1.0 and num_ramps > 0
    assert ramp_direction in ("x", "y", "radial")
    max_height = math.tan(math.radians(ramp_angle)) * 2.0
    X, Y = _grid_pm1(n)

    if ramp_direction in ("x", "y"):
        V = X if ramp_direction == "x" else Y
        if num_ramps == 1:
            flat_width = flat_ratio / 2.0
            ramp_v = (V + flat_width) / jnp.maximum(flat_width * 2, 1e-9)
            terrain = jnp.where(
                V < -flat_width, 0.0,
                jnp.where(V < flat_width,
                          _smoothstep(0.0, 1.0, ramp_v) * max_height,
                          max_height))
        else:
            period = 2.0 / num_ramps
            phase_norm = ((V + 1.0) % period) / period
            ramp_phase = (phase_norm - flat_ratio / 2) / (1.0 - flat_ratio)
            terrain = jnp.where(
                phase_norm < flat_ratio / 2, 0.0,
                jnp.where(phase_norm < 1.0 - flat_ratio / 2,
                          _smoothstep(0.0, 1.0, ramp_phase) * max_height,
                          max_height))
    else:  # radial
        R = jnp.sqrt(X ** 2 + Y ** 2)
        max_radius = math.sqrt(2.0)
        flat_radius = flat_ratio * max_radius / math.sqrt(2.0)
        ramp_r = jnp.clip((R - flat_radius) / (max_radius - flat_radius), 0.0, 1.0)
        terrain = jnp.where(R < flat_radius, 0.0,
                            _smoothstep(0.0, 1.0, ramp_r) * max_height)
    return _minmax_normalize(terrain).reshape(-1)


# --------------------------------------------------------------------------
# sinusoidal (terrain/sinusoidal.py:6-61)
# --------------------------------------------------------------------------
def generate_sinusoidal_terrain(n: int, amplitude: float = 0.5,
                                frequency: float = 0.1, direction: str = "both",
                                phase: float = 0.0, seed=None) -> jnp.ndarray:
    _check_odd(n)
    assert 0 <= amplitude <= 1.0 and frequency > 0
    assert direction in ("x", "y", "both")
    c = jnp.linspace(0.0, 2 * math.pi * frequency * n, n)
    X, Y = jnp.meshgrid(c, c, indexing="ij")
    if direction == "x":
        terrain = amplitude * jnp.sin(X + phase)
    elif direction == "y":
        terrain = amplitude * jnp.sin(Y + phase)
    else:
        terrain = amplitude * (jnp.sin(X + phase) + jnp.sin(Y + phase)) / 2.0
    return _minmax_normalize(terrain).reshape(-1)


# --------------------------------------------------------------------------
# ridge_valley (terrain/ridge_valley.py:12-89)
# --------------------------------------------------------------------------
def generate_ridge_valley_terrain(n: int, ridge_height: float = 0.6,
                                  valley_depth: float = 0.4, spacing: float = 0.2,
                                  orientation: str = "x", smoothness: float = 0.3,
                                  seed=None) -> jnp.ndarray:
    _check_odd(n)
    assert orientation in ("x", "y", "diagonal") and spacing > 0
    X, Y = _grid01(n)
    coord = {"x": X, "y": Y, "diagonal": X + Y}[orientation]
    pattern = jnp.cos(2 * math.pi * spacing * coord)
    terrain = valley_depth + (ridge_height - valley_depth) * (pattern + 1.0) / 2.0

    if smoothness > 0:
        k = int(smoothness * 5) + 1
        if k > 1:
            pad = k // 2
            padded = jnp.pad(terrain, pad, mode="edge")
            # box filter via two 1-D separable passes. Full fp32: TPU dots
            # default to bf16 inputs, which drifts terrain ~2e-4 vs CPU and
            # breaks cross-device/native value parity
            kernel = jnp.ones((k,), jnp.float32) / k
            hi = jax.lax.Precision.HIGHEST
            sm = jax.vmap(lambda r: jnp.convolve(r, kernel, mode="valid",
                                                 precision=hi))(padded)
            sm = jax.vmap(lambda c_: jnp.convolve(c_, kernel, mode="valid",
                                                  precision=hi),
                          in_axes=1, out_axes=1)(sm)
            # match reference shape semantics (k x k mean over pad..pad+k window)
            sm = sm[:n, :n]
            terrain = terrain * (1.0 - smoothness) + sm * smoothness
    return jnp.clip(terrain, 0.0, 1.0).reshape(-1)


# --------------------------------------------------------------------------
# hills (terrain/hills.py:6-103)
# --------------------------------------------------------------------------
def generate_hills_terrain(n: int, num_hills: int = 5, hill_height: float = 0.7,
                           hill_radius: float = 0.15, flat_ratio: float = 0.4,
                           seed=0) -> jnp.ndarray:
    _check_odd(n)
    assert num_hills > 0 and 0 <= hill_height <= 1.0 and 0 < hill_radius <= 0.5
    # Hill placement mirrors the reference's MT19937 rejection loop
    # (hills.py:43-71, np.random.RandomState(seed).uniform pairs). With a
    # CONCRETE seed (the bank path — make_terrain_bank feeds hills/mixed
    # concrete per-bank seeds precisely so this branch is taken) the loop
    # runs eagerly on host and the traced graph sees only array constants,
    # so the generator is fully TPU-device-checkable. Only a traced seed
    # (e.g. a user vmapping over seeds directly) falls back to the host
    # callback, which the axon relay cannot execute (docs/design/parity.md).
    def _positions_host(seed_val):
        rng = np.random.RandomState(int(np.asarray(seed_val)))
        min_distance = hill_radius * 2.0
        pos = []
        attempts = 0
        while len(pos) < num_hills and attempts < num_hills * 100:
            attempts += 1
            x = rng.uniform(hill_radius, 1.0 - hill_radius)
            y = rng.uniform(hill_radius, 1.0 - hill_radius)
            if all((x - ex) ** 2 + (y - ey) ** 2 >= min_distance ** 2
                   for ex, ey in pos):
                pos.append((x, y))
        out = np.full((num_hills, 2), 1e6, np.float32)
        for k, p in enumerate(pos):
            out[k] = p
        return out, np.int32(len(pos))

    seed_val = 0 if seed is None else seed
    if isinstance(seed_val, jax.core.Tracer):
        positions, count = jax.pure_callback(
            _positions_host,
            (jax.ShapeDtypeStruct((num_hills, 2), jnp.float32),
             jax.ShapeDtypeStruct((), jnp.int32)),
            jnp.asarray(seed_val, jnp.int32), vmap_method="sequential")
    else:
        positions, count = _positions_host(seed_val)

    X, Y = _grid01(n)
    sigma = hill_radius / 3.0
    terrain = jnp.zeros((n, n), jnp.float32)
    for h in range(num_hills):
        valid = h < count
        dx = X - positions[h, 0]
        dy = Y - positions[h, 1]
        r = jnp.sqrt(dx ** 2 + dy ** 2)
        hill = hill_height * jnp.exp(-(r ** 2) / (2 * sigma ** 2))
        cut = jnp.clip(1.0 - r / hill_radius, 0.0, 1.0)
        cut = cut * cut * (3.0 - 2.0 * cut)
        terrain = terrain + jnp.where(valid, hill * cut, 0.0)
    return jnp.clip(terrain, 0.0, 1.0).reshape(-1)


# --------------------------------------------------------------------------
# bowl (terrain/bowl.py:12-76)
# --------------------------------------------------------------------------
def generate_bowl_terrain(n: int, depth: float = 0.6, radius: float = 0.4,
                          center_x: float = 0.5, center_y: float = 0.5,
                          smoothness: float = 0.5, seed=None) -> jnp.ndarray:
    _check_odd(n)
    assert 0 <= depth <= 1.0 and 0 < radius <= 1.0
    X, Y = _grid01(n)
    r = jnp.sqrt((X - center_x) ** 2 + (Y - center_y) ** 2)
    r_norm = jnp.clip(r / radius, 0.0, 1.0)
    bowl = depth * (1.0 - _smoothstep(0.0, 1.0, r_norm))
    return jnp.clip(1.0 - bowl, 0.0, 1.0).reshape(-1)


# --------------------------------------------------------------------------
# gradient (terrain/gradient.py:6-99)
# --------------------------------------------------------------------------
def generate_gradient_terrain(n: int, max_slope: float = 20.0,
                              gradient_type: str = "linear",
                              smoothness: float = 0.5, direction: str = "x",
                              seed=0) -> jnp.ndarray:
    _check_odd(n)
    assert 0 <= max_slope <= 45
    assert gradient_type in ("linear", "radial", "perlin")
    assert direction in ("x", "y")
    g = math.tan(math.radians(max_slope)) * 2.0
    X, Y = _grid_pm1(n)

    if gradient_type == "linear":
        terrain = g * ((X if direction == "x" else Y) + 1.0) / 2.0
    elif gradient_type == "radial":
        R = jnp.sqrt(X ** 2 + Y ** 2)
        terrain = g * jnp.clip(R / math.sqrt(2.0), 0.0, 1.0)
    else:  # perlin-modulated gradient (gradient.py:69-95)
        # untiled snoise2 path: base is ADDED TO THE COORDINATES per octave
        idx = np.arange(n, dtype=np.float64) / 25.0
        Xi, Yj = np.meshgrid(idx, idx, indexing="ij")
        noise = snoise2_fbm(Xi.astype(np.float32), Yj.astype(np.float32),
                            octaves=3, persistence=0.3, lacunarity=2.0,
                            base=0 if seed is None else seed)
        base_grad = ((X if direction == "x" else Y) + 1.0) / 2.0
        terrain = g * (base_grad + noise * smoothness)
    return _minmax_normalize(terrain).reshape(-1)


# --------------------------------------------------------------------------
# terraced (terrain/terraced.py:12-108)
# --------------------------------------------------------------------------
def generate_terraced_terrain(n: int, num_terraces: int = 5,
                              terrace_height: float = 0.15,
                              transition_width: float = 0.1,
                              smoothness: float = 0.7, direction: str = "x",
                              seed=None) -> jnp.ndarray:
    _check_odd(n)
    assert num_terraces > 0 and 0 < terrace_height <= 1.0
    assert 0 < transition_width < 1.0 and direction in ("x", "y")
    X, Y = _grid01(n)
    c = X if direction == "x" else Y
    tw = 1.0 / num_terraces
    trans = tw * transition_width  # fraction of terrace width at each edge

    idx = jnp.minimum((c / tw).astype(jnp.int32), num_terraces - 1)
    pos = (c % tw) / tw
    base_h = idx.astype(jnp.float32) * terrace_height
    prev_h = jnp.maximum(idx - 1, 0).astype(jnp.float32) * terrace_height
    next_h = jnp.minimum(idx + 1, num_terraces - 1).astype(jnp.float32) * terrace_height

    # NOTE: the reference compares pos_in_terrace (within-terrace units)
    # against transition_size in ABSOLUTE coordinate units
    # (terraced.py:80-90) — a unit mismatch that shrinks the transition
    # zone by a factor num_terraces. Reproduced verbatim for parity.
    tsize = trans
    lo = _smoothstep(0.0, 1.0, pos / jnp.maximum(tsize, 1e-9))
    hi = _smoothstep(0.0, 1.0, (pos - (1.0 - tsize)) / jnp.maximum(tsize, 1e-9))
    terrain = jnp.where(
        pos < tsize, prev_h + (base_h - prev_h) * lo,
        jnp.where(pos > 1.0 - tsize, base_h + (next_h - base_h) * hi, base_h))
    return jnp.clip(terrain, 0.0, 1.0).reshape(-1)


# --------------------------------------------------------------------------
# wavy (terrain/wavy.py:6-86)
# --------------------------------------------------------------------------
def generate_wavy_terrain(n: int, wave_amplitudes: Optional[List[float]] = None,
                          wave_frequencies: Optional[List[float]] = None,
                          wave_directions: Optional[List[float]] = None,
                          phase_offsets: Optional[List[float]] = None,
                          seed=None) -> jnp.ndarray:
    _check_odd(n)
    wave_amplitudes = wave_amplitudes or [0.3, 0.2, 0.1]
    wave_frequencies = wave_frequencies or [0.05, 0.1, 0.2]
    wave_directions = wave_directions or [0.0, 45.0, 90.0]
    phase_offsets = phase_offsets or [0.0, 0.5, 1.0]
    k = len(wave_amplitudes)
    assert len(wave_frequencies) == k and len(wave_directions) == k
    assert len(phase_offsets) == k

    c = jnp.linspace(0.0, 2 * math.pi, n)
    X, Y = jnp.meshgrid(c, c, indexing="ij")
    terrain = jnp.zeros((n, n), jnp.float32)
    for amp, freq, deg, ph in zip(wave_amplitudes, wave_frequencies,
                                  wave_directions, phase_offsets):
        rad = math.radians(deg)
        coord = X * math.cos(rad) + Y * math.sin(rad)
        terrain = terrain + amp * jnp.sin(freq * coord + ph)
    return jnp.clip(terrain + 0.5, 0.0, 1.0).reshape(-1)


# --------------------------------------------------------------------------
# spiral (terrain/spiral.py:6-78)
# --------------------------------------------------------------------------
def generate_spiral_terrain(n: int, spiral_tightness: float = 0.1,
                            height_variation: float = 0.5, direction: str = "cw",
                            center_x: float = 0.5, center_y: float = 0.5,
                            seed=None) -> jnp.ndarray:
    _check_odd(n)
    assert spiral_tightness > 0 and 0 <= height_variation <= 1.0
    assert direction in ("cw", "ccw")
    X, Y = _grid01(n)
    dx, dy = X - center_x, Y - center_y
    r = jnp.sqrt(dx ** 2 + dy ** 2)
    theta = (jnp.arctan2(dy, dx) + 2 * math.pi) % (2 * math.pi)
    if direction == "cw":
        theta = 2 * math.pi - theta
    terrain = height_variation * jnp.sin(spiral_tightness * theta + r)
    r_norm = jnp.clip(r / (math.sqrt(2.0) / 2.0), 0.0, 1.0)
    terrain = terrain * (1.0 - r_norm * 0.3)
    return jnp.clip(0.5 + terrain * 0.5, 0.0, 1.0).reshape(-1)


# --------------------------------------------------------------------------
# mixed (terrain/mixed.py:7-101)
# --------------------------------------------------------------------------
def generate_mixed_terrain(n: int, components: List[Dict[str, Any]],
                           blend_mode: str = "additive", seed=None) -> jnp.ndarray:
    from openballbot_rl_tpu.core.factories import create_terrain

    _check_odd(n)
    assert len(components) > 0
    assert blend_mode in ("additive", "max", "weighted")

    terrains, weights = [], []
    for comp in components:
        if not isinstance(comp, dict):
            raise ValueError(f"Component must be a dict, got {type(comp)}")
        ctype = comp.get("type")
        if ctype is None:
            raise ValueError("Component must have 'type' key")
        cfg = dict(comp.get("config", {}))
        if "seed" not in cfg and seed is not None:
            cfg["seed"] = seed
        gen = create_terrain({"type": ctype, "config": cfg})
        terrains.append(gen(n, seed=seed).reshape(n, n))
        weights.append(comp.get("weight", 1.0))

    total_w = sum(weights)
    if blend_mode == "additive":
        out = sum(t * (w / total_w) for t, w in zip(terrains, weights))
    elif blend_mode == "max":
        out = terrains[0] * weights[0]
        for t, w in zip(terrains[1:], weights[1:]):
            out = jnp.maximum(out, t * w)
    else:  # weighted
        out = sum(t * w for t, w in zip(terrains, weights)) / total_w
    return jnp.clip(out, 0.0, 1.0).reshape(-1)


# --------------------------------------------------------------------------
# flat (terrain/__init__.py:32-34)
# --------------------------------------------------------------------------
def generate_flat_terrain(n: int, **kwargs) -> jnp.ndarray:
    return jnp.zeros(n * n, jnp.float32)
