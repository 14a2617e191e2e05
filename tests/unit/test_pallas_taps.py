"""Pallas terrain-tap kernels: bit-exactness vs the XLA one-hot path.

On CPU (this suite) the kernels run through the Pallas interpreter; the
same code compiles with Mosaic on TPU. Exactness is layout-independent:
one-hot selection passes the chosen f32 through untouched.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openballbot_rl_tpu.ops.pallas_taps import (
    P, PP, patch_taps_rows, taps_reference, tile_taps_fused)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    R, B = 64, 128
    tiles = jnp.asarray(rng.random((R, PP)), jnp.float32)
    flat = jnp.asarray(rng.integers(0, R, B), jnp.int32)
    li0 = jnp.asarray(rng.integers(0, P, (B, 6)), jnp.int32)
    li1 = jnp.clip(li0 + 1, 0, P - 1)
    lj0 = jnp.asarray(rng.integers(0, P, (B, 6)), jnp.int32)
    lj1 = jnp.clip(lj0 + 1, 0, P - 1)
    rows = jnp.take(tiles, flat, axis=0)
    return tiles, flat, rows, li0, li1, lj0, lj1


def test_reference_is_direct_indexing(data):
    _, _, rows, li0, li1, lj0, lj1 = data
    t00, t01, t10, t11 = taps_reference(rows, li0, li1, lj0, lj1)
    rows_np = np.asarray(rows)
    b = np.arange(rows.shape[0])[:, None]
    np.testing.assert_array_equal(
        np.asarray(t00), rows_np[b, np.asarray(li0) * P + np.asarray(lj0)])
    np.testing.assert_array_equal(
        np.asarray(t11), rows_np[b, np.asarray(li1) * P + np.asarray(lj1)])
    np.testing.assert_array_equal(
        np.asarray(t01), rows_np[b, np.asarray(li0) * P + np.asarray(lj1)])
    np.testing.assert_array_equal(
        np.asarray(t10), rows_np[b, np.asarray(li1) * P + np.asarray(lj0)])


def test_rows_kernel_bitwise(data):
    _, _, rows, li0, li1, lj0, lj1 = data
    ref = taps_reference(rows, li0, li1, lj0, lj1)
    got = patch_taps_rows(rows, li0, li1, lj0, lj1, block=64)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_rows_kernel_odd_batch(data):
    tiles, _, _, li0, li1, lj0, lj1 = data
    B = 37                                   # not a multiple of the block
    rng = np.random.default_rng(1)
    rows = jnp.take(tiles, jnp.asarray(rng.integers(0, tiles.shape[0], B),
                                       jnp.int32), axis=0)
    sl = lambda a: a[:B]
    ref = taps_reference(rows, sl(li0), sl(li1), sl(lj0), sl(lj1))
    got = patch_taps_rows(rows, sl(li0), sl(li1), sl(lj0), sl(lj1))
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_fused_kernel_bitwise(data):
    tiles, flat, rows, li0, li1, lj0, lj1 = data
    ref = taps_reference(rows, li0, li1, lj0, lj1)
    got = tile_taps_fused(tiles, flat, li0, li1, lj0, lj1, block=64)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
