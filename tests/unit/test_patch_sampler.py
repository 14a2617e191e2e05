"""Gather-free patch sampler (hfield.make_patch_sampler + env patch cache).

The whole point is BIT-EXACTNESS vs the bank sampler while queries stay
inside the patch — the env's refresh cadence guarantees containment, and
these tests pin the equality so the goldens never move.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openballbot_rl_tpu.core.factories import create_terrain
from openballbot_rl_tpu.physics import hfield as hf


@pytest.fixture(scope="module")
def terrain():
    gen = create_terrain({"type": "perlin",
                          "config": {"scale": 25.0, "octaves": 4,
                                     "persistence": 0.2, "lacunarity": 2.0}})
    return jnp.asarray(gen(293, seed=9), jnp.float32).reshape(1, 293, 293)


class TestPatchSampler:
    def _compare(self, terrain, cx, cy, qx, qy):
        n = terrain.shape[-1]
        bank_sampler = hf.make_sampler(terrain, jnp.asarray(0), 5.0, 2.0)
        patch, pij = hf.extract_patch(terrain, jnp.asarray(0),
                                      jnp.asarray(cx), jnp.asarray(cy),
                                      n, 5.0, 32)
        patch_sampler = hf.make_patch_sampler(patch, pij, n, 5.0, 2.0)
        a = [np.asarray(v) for v in bank_sampler(qx, qy)]
        b = [np.asarray(v) for v in patch_sampler(qx, qy)]
        for va, vb in zip(a, b):
            np.testing.assert_array_equal(va, vb)   # BITWISE

    def test_bitwise_equal_interior(self, terrain):
        rng = np.random.default_rng(0)
        cx, cy = 0.83, -1.21
        qx = jnp.asarray(cx + rng.uniform(-0.4, 0.4, (6,)), jnp.float32)
        qy = jnp.asarray(cy + rng.uniform(-0.4, 0.4, (6,)), jnp.float32)
        self._compare(terrain, cx, cy, qx, qy)

    def test_bitwise_equal_at_world_edge(self, terrain):
        # patch slice clamps at the terrain border; queries beyond the world
        # clamp exactly like the bank sampler
        cx, cy = 4.9, -4.95
        qx = jnp.asarray([4.7, 4.99, 5.3, 4.85], jnp.float32)
        qy = jnp.asarray([-4.8, -5.2, -4.99, -4.7], jnp.float32)
        self._compare(terrain, cx, cy, qx, qy)

    def test_exact_cell_boundaries(self, terrain):
        # queries exactly on grid lines exercise the floor/one-hot edges
        cell = 10.0 / 292
        cx = cy = 0.0
        qs = jnp.asarray([0.0, cell, 5 * cell, -3 * cell], jnp.float32)
        self._compare(terrain, cx, cy, qs, qs)


class TestAlignedTiles:
    def test_make_tiles_layout(self, terrain):
        """Tile (k, a, b) at flat row (k*T + a)*T + b must equal the
        edge-replicated slice of the source terrain at origin (a*S, b*S)."""
        n = terrain.shape[-1]
        tiles = np.asarray(hf.make_tiles(terrain))
        T = hf.tiles_per_dim(n)
        P, S = hf.TILE_SIZE, hf.TILE_STRIDE
        assert tiles.shape == (T * T, P * P)
        full = np.asarray(terrain[0])
        for a, b in [(0, 0), (3, 7), (T - 1, 0), (0, T - 1),
                     (T - 1, T - 1), (17, T - 1)]:
            row = tiles[a * T + b].reshape(P, P)
            ii = np.clip(np.arange(a * S, a * S + P), 0, n - 1)
            jj = np.clip(np.arange(b * S, b * S + P), 0, n - 1)
            np.testing.assert_array_equal(row, full[np.ix_(ii, jj)])

    def test_tile_select_contains_footprint(self):
        """For any world position, the selected tile must contain every
        bilinear tap within the robot footprint (+1 corner cell) — the
        condition under which the tile sampler is bit-exact vs the bank
        sampler. F=8 cells (~27 cm) over-covers the ball + body-sphere
        footprint (~7 cells incl. tilt)."""
        n = 293
        T = hf.tiles_per_dim(n)
        P, S = hf.TILE_SIZE, hf.TILE_STRIDE
        rng = np.random.default_rng(1)
        xs = jnp.asarray(rng.uniform(-5.2, 5.2, (4096,)), jnp.float32)
        ys = jnp.asarray(rng.uniform(-5.2, 5.2, (4096,)), jnp.float32)
        _, pij = jax.vmap(
            lambda x, y: hf.tile_select(jnp.asarray(0), x, y, n, 5.0, T)
        )(xs, ys)
        pij = np.asarray(pij)
        F = 8.0
        for g, o in ((np.asarray((ys + 5.0) / 10.0 * (n - 1)), pij[:, 0]),
                     (np.asarray((xs + 5.0) / 10.0 * (n - 1)), pij[:, 1])):
            i0_min = np.floor(np.clip(g - F, 0.0, n - 1.001)).astype(int)
            i0_max = np.floor(np.clip(g + F, 0.0, n - 1.001)).astype(int)
            assert (o <= i0_min).all(), "tap below tile origin"
            assert (i0_max + 1 <= o + P - 1).all(), "tap beyond tile end"

    def test_env_tiles_vs_legacy_cadence_bitwise(self, terrain):
        """Same bank with and without tiles: the stateless tile path must
        reproduce the legacy cadence-refresh trajectory bit for bit."""
        from openballbot_rl_tpu.envs import (
            BallbotEnv, EnvParams, make_terrain_bank)

        gen = create_terrain({"type": "perlin",
                              "config": {"scale": 25.0, "octaves": 4,
                                         "persistence": 0.2,
                                         "lacunarity": 2.0}})
        bank_tiles = make_terrain_bank(gen, 293, 2.0, jax.random.PRNGKey(0),
                                       2)
        bank_plain = bank_tiles.replace(tiles=None)
        assert bank_tiles.tiles is not None

        B, T = 4, 60
        env = BallbotEnv(EnvParams(max_ep_steps=50))
        outs = {}
        for name, bank in (("tiles", bank_tiles), ("legacy", bank_plain)):
            keys = jax.random.split(jax.random.PRNGKey(2), B)
            states, _ = jax.jit(env.batch_reset)(bank, keys)

            @jax.jit
            def roll(states):
                def f(carry, t):
                    states, key = carry
                    key, k = jax.random.split(key)
                    a = jax.random.uniform(k, (B, 3), minval=-1, maxval=1)
                    states, obs, r, d, _ = env.batch_step(bank, states, a)
                    return (states, key), (states.phys.base_pos, r, d)
                _, ys = jax.lax.scan(f, (states, jax.random.PRNGKey(3)),
                                     jnp.arange(T))
                return ys

            outs[name] = jax.tree.map(np.asarray, roll(states))
        for va, vb in zip(outs["tiles"], outs["legacy"]):
            np.testing.assert_array_equal(va, vb)


class TestPallasTapParity:
    """Round 5: the Pallas tap kernels (EnvParams.terrain_taps) must
    reproduce the XLA one-hot trajectory bit for bit — same bank, same
    keys, 60 batched steps across tile-boundary crossings and resets."""

    @pytest.mark.parametrize("impl", ["pallas_rows", "pallas_fused"])
    def test_env_trajectory_bitwise(self, terrain, impl):
        from openballbot_rl_tpu.envs import (
            BallbotEnv, EnvParams, make_terrain_bank)

        gen = create_terrain({"type": "perlin",
                              "config": {"scale": 25.0, "octaves": 4,
                                         "persistence": 0.2,
                                         "lacunarity": 2.0}})
        bank = make_terrain_bank(gen, 293, 2.0, jax.random.PRNGKey(0), 2)

        B, T = 4, 60
        outs = {}
        for name in ("onehot", impl):
            env = BallbotEnv(EnvParams(max_ep_steps=50, terrain_taps=name))
            keys = jax.random.split(jax.random.PRNGKey(2), B)
            states, _ = jax.jit(env.batch_reset)(bank, keys)

            @jax.jit
            def roll(states, env=env):
                def f(carry, t):
                    states, key = carry
                    key, k = jax.random.split(key)
                    a = jax.random.uniform(k, (B, 3), minval=-1, maxval=1)
                    states, obs, r, d, _ = env.batch_step(bank, states, a)
                    return (states, key), (states.phys.base_pos, r, d)
                _, ys = jax.lax.scan(f, (states, jax.random.PRNGKey(3)),
                                     jnp.arange(T))
                return ys

            outs[name] = jax.tree.map(np.asarray, roll(states))
        for va, vb in zip(outs["onehot"], outs[impl]):
            np.testing.assert_array_equal(va, vb)


class TestEnvPatchEquivalence:
    def test_trajectory_bitwise_vs_bank_sampler(self, terrain):
        """200 batched steps across refresh boundaries and auto-resets:
        terrain_patch=True must reproduce the bank-sampler trajectory
        bit for bit."""
        from openballbot_rl_tpu.envs import (
            BallbotEnv, EnvParams, TerrainBank)

        bank = TerrainBank(
            heights=jnp.concatenate([terrain, 0.5 * terrain]),
            spawn_offsets=jnp.asarray(
                [float(hf.spawn_height_offset(terrain[0], 2.0)),
                 float(hf.spawn_height_offset(0.5 * terrain[0], 2.0))]),
            seeds=jnp.asarray([9, 10], jnp.int32))

        B, T = 4, 200
        outs = {}
        for flag in (True, False):
            env = BallbotEnv(EnvParams(max_ep_steps=70, terrain_patch=flag))
            keys = jax.random.split(jax.random.PRNGKey(2), B)
            states, obs = jax.jit(env.batch_reset)(bank, keys)

            @jax.jit
            def roll(states, obs):
                def f(carry, t):
                    states, key = carry
                    key, k = jax.random.split(key)
                    actions = jax.random.uniform(k, (B, 3), minval=-1,
                                                 maxval=1)
                    states, obs, r, d, _ = env.batch_step(bank, states,
                                                          actions)
                    return (states, key), (states.phys.base_pos, r, d)
                (states, _), ys = jax.lax.scan(
                    f, (states, jax.random.PRNGKey(3)), jnp.arange(T))
                return ys

            outs[flag] = jax.tree.map(np.asarray, roll(states, obs))

        pos_a, r_a, d_a = outs[True]
        pos_b, r_b, d_b = outs[False]
        assert d_a.sum() > 0, "no auto-resets exercised"
        np.testing.assert_array_equal(pos_a, pos_b)
        np.testing.assert_array_equal(r_a, r_b)
        np.testing.assert_array_equal(d_a, d_b)

    def test_bank_swap_is_picked_up_immediately(self, terrain):
        """Swapping the bank mid-trajectory (curriculum regen) must reach
        the physics on the very next step, exactly like the bank sampler
        (TerrainBank.version force-refresh)."""
        from openballbot_rl_tpu.envs import (
            BallbotEnv, EnvParams, make_terrain_bank)
        from openballbot_rl_tpu.core.factories import create_terrain

        gen = create_terrain({"type": "perlin",
                              "config": {"scale": 25.0, "octaves": 4,
                                         "persistence": 0.2,
                                         "lacunarity": 2.0}})
        bank_a = make_terrain_bank(gen, 293, 2.0, jax.random.PRNGKey(0), 2)
        gen2 = create_terrain({"type": "perlin",
                               "config": {"scale": 25.0, "octaves": 4,
                                          "persistence": 0.2,
                                          "lacunarity": 2.0,
                                          "amplitude": 0.4}})
        bank_b = make_terrain_bank(gen2, 293, 2.0, jax.random.PRNGKey(5), 2)

        B = 3
        outs = {}
        for flag in (True, False):
            env = BallbotEnv(EnvParams(terrain_patch=flag))
            keys = jax.random.split(jax.random.PRNGKey(4), B)
            states, _ = jax.jit(env.batch_reset)(bank_a, keys)
            step = jax.jit(env.batch_step)
            traj = []
            key = jax.random.PRNGKey(6)
            for t in range(14):                    # swap mid-cadence (t=5)
                bank = bank_a if t < 5 else bank_b
                key, k = jax.random.split(key)
                a = jax.random.uniform(k, (B, 3), minval=-1, maxval=1)
                states, obs, r, d, _ = step(bank, states, a)
                traj.append(np.asarray(states.phys.base_pos))
            outs[flag] = np.stack(traj)
        np.testing.assert_array_equal(outs[True], outs[False])
