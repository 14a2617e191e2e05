"""Terrain generator tests (mirror of reference tests/unit/test_terrains.py:19-426).

Every generator must return shape (n*n,) in [0, 1]; perlin and hills must be
seed-reproducible and seed-sensitive (test_terrains.py:32-45,176-181).
"""
import numpy as np
import pytest

import openballbot_rl_tpu.terrain as T
from openballbot_rl_tpu.core.factories import create_terrain

N = 61  # small odd grid for speed


GENS = {
    "perlin": {},
    "stepped": {"num_steps": 4, "step_height": 0.2},
    "ramp": {"ramp_angle": 10.0},
    "sinusoidal": {"amplitude": 0.5, "frequency": 0.05},
    "ridge_valley": {"spacing": 2.0},
    "hills": {"num_hills": 4},
    "bowl": {},
    "gradient": {"gradient_type": "linear"},
    "terraced": {"num_terraces": 4},
    "wavy": {},
    "spiral": {},
    "flat": {},
}


@pytest.mark.parametrize("name,cfg", sorted(GENS.items()))
def test_shape_and_range(name, cfg):
    fn = getattr(T, f"generate_{name}_terrain")
    out = np.asarray(fn(N, seed=3, **cfg))
    assert out.shape == (N * N,)
    assert out.min() >= 0.0 - 1e-6
    assert out.max() <= 1.0 + 1e-6
    assert np.all(np.isfinite(out))


def test_mixed_blends():
    cfg = {"components": [
        {"type": "perlin", "weight": 0.7, "config": {"scale": 10.0}},
        {"type": "bowl", "weight": 0.3, "config": {}},
    ], "blend_mode": "additive"}
    out = np.asarray(T.generate_mixed_terrain(N, seed=1, **cfg))
    assert out.shape == (N * N,)
    assert 0.0 <= out.min() and out.max() <= 1.0


@pytest.mark.parametrize("name", ["perlin", "hills"])
def test_seed_reproducibility(name):
    fn = getattr(T, f"generate_{name}_terrain")
    a = np.asarray(fn(N, seed=7))
    b = np.asarray(fn(N, seed=7))
    c = np.asarray(fn(N, seed=8))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_perlin_is_not_constant_and_smooth():
    out = np.asarray(T.generate_perlin_terrain(N, seed=0)).reshape(N, N)
    assert out.std() > 0.01
    # neighboring cells differ by less than the global range (smoothness)
    d = np.abs(np.diff(out, axis=0)).max()
    assert d < 0.2 * (out.max() - out.min() + 1e-9)


def test_factory_closure_merges_seed_override(terrain_config):
    gen = create_terrain(terrain_config)
    a = np.asarray(gen(N, seed=5))
    b = np.asarray(gen(N, seed=5))
    c = np.asarray(gen(N, seed=6))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_flat_is_zero():
    assert np.all(np.asarray(T.generate_flat_terrain(N)) == 0.0)


def test_jit_compatible():
    import functools
    import jax

    f = jax.jit(functools.partial(T.generate_perlin_terrain, N))
    out = np.asarray(f(seed=2))
    out2 = np.asarray(T.generate_perlin_terrain(N, seed=2))
    np.testing.assert_allclose(out, out2, atol=1e-5)  # jit fusion reassociation
