"""Test configuration: force the CPU backend with 8 virtual devices.

This environment registers an experimental TPU PJRT plugin in sitecustomize
and pins jax_platforms to it; its network handshake is slow/flaky, so tests
run on the host CPU. Eight virtual devices back the sharding/multi-chip tests
(SURVEY.md §2.4) without real hardware.
"""
from __future__ import annotations

import os

import pytest

# must happen before the first JAX backend use
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# the scalarized physics engine produces large (fast, but slow-to-compile)
# HLO graphs; a persistent cache makes repeat suite runs cheap
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def ballbot_model():
    from openballbot_rl_tpu.physics import make_model

    return make_model().as_jnp()


@pytest.fixture
def test_state():
    """A fake obs dict for reward tests (mirrors tests/conftest.py:test_state
    in the reference: rewards are tested against plain dicts, no env)."""
    import numpy as np

    return {
        "vel": np.array([0.5, 0.3, 0.0], dtype=np.float32),
        "orientation": np.zeros(3, dtype=np.float32),
        "pos2d": np.array([1.0, 2.0], dtype=np.float32),
    }


@pytest.fixture
def reward_config():
    return {"type": "directional", "config": {"target_direction": [0.0, 1.0]}}


@pytest.fixture
def terrain_config():
    return {"type": "perlin",
            "config": {"scale": 25.0, "octaves": 4, "persistence": 0.2,
                       "lacunarity": 2.0, "seed": None}}
