"""Pallas kernel tests (ops/) — interpret-mode correctness vs the XLA
reference (compiled-TPU parity was verified on hardware; see the module
docstring of ops/tent_sample.py for its performance status)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openballbot_rl_tpu.ops import (
    tent_sample, tent_sample_batched, tent_sample_ref)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    P, M, B = 118, 1000, 3
    return (jnp.asarray(rng.uniform(0, P - 1, (B, M)), jnp.float32),
            jnp.asarray(rng.uniform(0, P - 1, (B, M)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, P, P)), jnp.float32))


def test_single_matches_einsum(data):
    grs, gcs, patches = data
    hk = tent_sample(grs[0], gcs[0], patches[0], block_m=256, interpret=True)
    hr = tent_sample_ref(grs[0], gcs[0], patches[0])
    np.testing.assert_allclose(np.asarray(hk), np.asarray(hr), atol=1e-5)


def test_batched_matches_einsum(data):
    grs, gcs, patches = data
    hk = tent_sample_batched(grs, gcs, patches, block_m=256, interpret=True)
    hr = jax.vmap(tent_sample_ref)(grs, gcs, patches)
    np.testing.assert_allclose(np.asarray(hk), np.asarray(hr), atol=1e-5)


def test_integer_coords_hit_exact_cells(data):
    _, _, patches = data
    gr = jnp.asarray([0.0, 5.0, 117.0], jnp.float32)
    gc = jnp.asarray([3.0, 0.0, 117.0], jnp.float32)
    h = tent_sample(gr, gc, patches[0], block_m=256, interpret=True)
    want = [patches[0, 0, 3], patches[0, 5, 0], patches[0, 117, 117]]
    np.testing.assert_allclose(np.asarray(h), np.asarray(want), atol=1e-6)
