"""Element-wise terrain parity vs the reference generators.

Loads the reference's numpy terrain modules standalone (file-level import —
their package __init__ needs deps this env lacks) and compares my JAX
generators element-wise across seeds and parameter variations.

`perlin` (and the gradient generator's perlin mode) cannot import the
reference module directly — it needs the C `noise` package, not installable
here — so those are tested against tools/vendored_snoise.py (the NumPy
float32 reimplementation of that C extension's snoise2, both the untiled
and the tiled/torus-4D paths) plus the committed golden table
tests/golden/perlin_oracle_table.npz, which also guards the oracle itself
against drift. Provenance caveat recorded in docs/design/parity.md.

`mixed` imports the reference package's factory; a sys.modules stub routes
that to the same standalone-loaded reference generators (see _ref_mixed), so
all 13 generators are now reference-parity-tested. No exclusions remain.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

REF_DIR = "/root/reference/ballbot_gym/terrain"
REPO_ROOT = os.path.join(os.path.dirname(__file__), "..", "..")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not available")


def _oracle():
    sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))
    import vendored_snoise
    return vendored_snoise


def _ref(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_terrain_{name}", os.path.join(REF_DIR, f"{name}.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return getattr(m, f"generate_{name}_terrain")


CASES = [
    ("stepped", {}), ("stepped", {"num_steps": 8, "step_height": 0.05}),
    ("ramp", {}), ("ramp", {"ramp_angle": 25.0, "ramp_direction": "y"}),
    ("ramp", {"ramp_direction": "radial"}),
    ("sinusoidal", {}), ("sinusoidal", {"amplitude": 0.3, "frequency": 0.2,
                                        "direction": "x"}),
    ("ridge_valley", {}), ("ridge_valley", {"orientation": "y",
                                            "spacing": 0.3}),
    ("hills", {}), ("hills", {"num_hills": 9, "hill_radius": 0.1}),
    ("bowl", {}), ("bowl", {"depth": 0.8, "radius": 0.3}),
    ("gradient", {}), ("gradient", {"gradient_type": "radial"}),
    ("terraced", {}), ("terraced", {"num_terraces": 8, "direction": "y"}),
    ("wavy", {}),
    ("spiral", {}), ("spiral", {"direction": "ccw",
                                "spiral_tightness": 0.2}),
]


@pytest.mark.parametrize("name,params", CASES)
@pytest.mark.parametrize("seed", [7, 123])
def test_generator_matches_reference(name, params, seed):
    from openballbot_rl_tpu.core.factories import create_terrain

    ref_fn = _ref(name)
    want = np.asarray(ref_fn(65, seed=seed, **params), np.float64)
    mine = np.asarray(create_terrain({"type": name, "config": params})(
        65, seed=seed), np.float64)
    assert mine.shape == want.shape
    np.testing.assert_allclose(
        mine, want, atol=5e-5,
        err_msg=f"'{name}' {params} seed={seed} diverges from reference")


# ---------------------------------------------------------------------------
# perlin: vs the vendored snoise2 oracle (tools/vendored_snoise.py)
# ---------------------------------------------------------------------------
PERLIN_CASES = [
    {}, {"octaves": 6, "persistence": 0.5}, {"scale": 10.0},
    {"amplitude": 0.15}, {"lacunarity": 3.0},
]


@pytest.mark.parametrize("params", PERLIN_CASES)
@pytest.mark.parametrize("seed", [0, 7, 9999])
def test_perlin_matches_vendored_oracle(params, seed):
    from openballbot_rl_tpu.core.factories import create_terrain

    want = _oracle().generate_perlin_terrain_oracle(65, seed=seed, **params)
    mine = np.asarray(create_terrain({"type": "perlin", "config": params})(
        65, seed=seed), np.float64)
    np.testing.assert_allclose(
        mine, want, atol=1e-6,
        err_msg=f"perlin {params} seed={seed} diverges from snoise2 oracle")


def test_gradient_perlin_mode_matches_vendored_oracle():
    """gradient.py:63-95: untiled snoise2 (octaves 3, persistence 0.3),
    base added to the coordinates, noise modulating a linear gradient,
    min-max normalized."""
    from openballbot_rl_tpu.core.factories import create_terrain

    vs = _oracle()
    n, seed, smoothness, max_slope = 65, 42, 0.5, 20.0
    g = np.tan(np.radians(max_slope)) * 2.0
    center = n // 2
    xs = (np.arange(n) - center) / center
    X, _ = np.meshgrid(xs, xs, indexing="ij")
    idx = np.arange(n, dtype=np.float64) / 25.0
    Xi, Yj = np.meshgrid(idx, idx, indexing="ij")
    nv = vs.snoise2(Xi, Yj, octaves=3, persistence=0.3,
                    base=seed).astype(np.float64)
    t = g * ((X + 1.0) / 2.0 + nv * smoothness)
    want = ((t - t.min()) / (t.max() - t.min())).flatten()
    mine = np.asarray(create_terrain({"type": "gradient", "config": {
        "gradient_type": "perlin", "smoothness": smoothness,
        "max_slope": max_slope}})(n, seed=seed), np.float64)
    np.testing.assert_allclose(mine, want, atol=1e-6)


def test_golden_table_pins_oracle_and_generators():
    """The committed golden table (tools/make_perlin_golden.py) guards both
    the oracle and the JAX/native generators against drift."""
    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.terrain.native import (native_available,
                                                   perlin_terrain_native)

    path = os.path.join(REPO_ROOT, "tests", "golden",
                        "perlin_oracle_table.npz")
    table = np.load(path)
    vs = _oracle()
    cases = {
        "perlin_n65_s0": (65, {"seed": 0}),
        "perlin_n65_s7": (65, {"seed": 7}),
        "perlin_n65_s123": (65, {"seed": 123}),
        "perlin_n65_s9999": (65, {"seed": 9999}),
        "perlin_n65_s7_oct6": (65, {"seed": 7, "octaves": 6,
                                    "persistence": 0.5}),
        "perlin_n65_s7_scale10": (65, {"seed": 7, "scale": 10.0}),
        "perlin_n65_s7_amp015": (65, {"seed": 7, "amplitude": 0.15}),
        "perlin_n293_s42": (293, {"seed": 42}),
    }
    for key, (n, kw) in cases.items():
        golden = table[key]
        # oracle drift guard: regenerating must be bit-identical
        np.testing.assert_array_equal(
            vs.generate_perlin_terrain_oracle(n, **kw), golden,
            err_msg=f"oracle drifted from golden {key}")
        seed = kw.pop("seed")
        mine = np.asarray(create_terrain({"type": "perlin", "config": kw})(
            n, seed=seed), np.float64)
        np.testing.assert_allclose(mine, golden, atol=1e-6,
                                   err_msg=f"JAX generator vs golden {key}")
        if native_available():
            got = perlin_terrain_native(n, seed=seed, **kw).astype(np.float64)
            np.testing.assert_allclose(got, golden, atol=1e-6,
                                       err_msg=f"native vs golden {key}")


# ---------------------------------------------------------------------------
# mixed: the reference module imports its package factory; satisfy that with
# a sys.modules stub that routes create_terrain to the SAME standalone-loaded
# reference generators, so composition semantics (additive/max/weighted
# blending, weight normalization, seed plumbing, final clip) are pinned
# element-wise against /root/reference/ballbot_gym/terrain/mixed.py:7-101.
# ---------------------------------------------------------------------------
def _ref_mixed():
    import types

    ref_gens = {t: _ref(t) for t in
                ("sinusoidal", "bowl", "hills", "ramp", "ridge_valley")}

    def create_terrain(config):
        fn = ref_gens[config["type"]]
        cfg = config.get("config", {})

        def configured(n, **override):
            return fn(n, **{**cfg, **override})

        return configured

    saved = {k: sys.modules.get(k) for k in
             ("ballbot_gym", "ballbot_gym.core",
              "ballbot_gym.core.factories")}
    try:
        pkg = types.ModuleType("ballbot_gym")
        core = types.ModuleType("ballbot_gym.core")
        fac = types.ModuleType("ballbot_gym.core.factories")
        fac.create_terrain = create_terrain
        pkg.core = core
        core.factories = fac
        sys.modules["ballbot_gym"] = pkg
        sys.modules["ballbot_gym.core"] = core
        sys.modules["ballbot_gym.core.factories"] = fac
        return _ref("mixed")
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


MIXED_CASES = [
    {"components": [
        {"type": "sinusoidal", "weight": 0.7,
         "config": {"amplitude": 0.4, "frequency": 0.15}},
        {"type": "bowl", "weight": 0.3, "config": {"depth": 0.6}}],
     "blend_mode": "additive"},
    {"components": [
        {"type": "ramp", "weight": 1.0, "config": {"ramp_angle": 10.0}},
        {"type": "ridge_valley", "weight": 0.5, "config": {}}],
     "blend_mode": "max"},
    {"components": [
        {"type": "hills", "weight": 2.0,
         "config": {"num_hills": 5, "hill_radius": 0.15}},
        {"type": "sinusoidal", "weight": 1.0, "config": {}}],
     "blend_mode": "weighted"},
]


@pytest.mark.parametrize("params", MIXED_CASES)
@pytest.mark.parametrize("seed", [7, 123])
def test_mixed_matches_reference(params, seed):
    from openballbot_rl_tpu.core.factories import create_terrain

    ref_fn = _ref_mixed()
    want = np.asarray(ref_fn(65, seed=seed, **params), np.float64)
    mine = np.asarray(create_terrain({"type": "mixed", "config": params})(
        65, seed=seed), np.float64)
    assert mine.shape == want.shape
    np.testing.assert_allclose(
        mine, want, atol=5e-5,
        err_msg=f"'mixed' {params} seed={seed} diverges from reference")
