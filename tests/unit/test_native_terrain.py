"""Native (C++) terrain generator tests — value parity with the JAX simplex
and the bank-generation path. Skipped when native/libobb_terrain.so is not
built (make -C native)."""
import numpy as np
import pytest

from openballbot_rl_tpu.terrain.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library not built (make -C native)")


def test_value_parity_with_jax():
    from openballbot_rl_tpu.terrain.generators import generate_perlin_terrain
    from openballbot_rl_tpu.terrain.native import perlin_terrain_native

    for seed in (0, 7, 9999):
        nat = perlin_terrain_native(129, seed=seed)
        jx = np.asarray(generate_perlin_terrain(129, seed=seed))
        np.testing.assert_allclose(nat, jx, atol=5e-7)


def test_bank_matches_per_terrain_calls():
    from openballbot_rl_tpu.terrain.native import (
        perlin_bank_native, perlin_terrain_native)

    seeds = np.array([3, 14, 159], np.int32)
    bank = perlin_bank_native(seeds, 65)
    for k, s in enumerate(seeds):
        np.testing.assert_array_equal(bank[k].reshape(-1),
                                      perlin_terrain_native(65, seed=int(s)))


def test_make_terrain_bank_native_path():
    import jax

    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.envs import make_terrain_bank

    gen = create_terrain({"type": "perlin", "config": {"scale": 25.0}})
    key = jax.random.PRNGKey(0)
    native = make_terrain_bank(gen, 65, 2.0, key, 4, use_native=True)
    jaxed = make_terrain_bank(gen, 65, 2.0, key, 4, use_native=False)
    np.testing.assert_array_equal(np.asarray(native.seeds),
                                  np.asarray(jaxed.seeds))
    np.testing.assert_allclose(np.asarray(native.heights),
                               np.asarray(jaxed.heights), atol=5e-7)
    np.testing.assert_allclose(np.asarray(native.spawn_offsets),
                               np.asarray(jaxed.spawn_offsets), atol=2e-6)


def test_non_perlin_use_native_raises():
    import jax

    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.envs import make_terrain_bank

    gen = create_terrain({"type": "flat", "config": {}})
    with pytest.raises(RuntimeError, match="no native generator"):
        make_terrain_bank(gen, 65, 2.0, jax.random.PRNGKey(0), 2,
                          use_native=True)
    # auto mode (None) quietly uses the JAX path
    bank = make_terrain_bank(gen, 65, 2.0, jax.random.PRNGKey(0), 2)
    assert float(np.asarray(bank.heights).max()) == 0.0
