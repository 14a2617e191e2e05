"""Multi-device sharding tests on the 8-way virtual CPU mesh (SURVEY.md §2.4:
env-batch data parallelism over a jax.sharding.Mesh; params replicated)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openballbot_rl_tpu.core.factories import create_terrain
from openballbot_rl_tpu.envs import BallbotEnv, EnvParams, make_terrain_bank
from openballbot_rl_tpu.parallel.mesh import (
    env_sharding, make_mesh, model_parallel_params, replicate,
    shard_env_axis)
from openballbot_rl_tpu.train import PPO, PPOConfig

pytestmark = pytest.mark.integration


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must expose 8 virtual devices"
    env = BallbotEnv(EnvParams(max_ep_steps=32))
    gen = create_terrain({"type": "flat", "config": {}})
    bank = make_terrain_bank(gen, env.model.hfield_n, 2.0,
                             jax.random.PRNGKey(0), 1)
    return env, bank


def test_mesh_construction():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8}


def test_sharded_env_step_matches_single_device(setup):
    env, bank = setup
    mesh = make_mesh(8)
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states, obs = jax.jit(env.batch_reset)(bank, keys)
    actions = jax.random.uniform(jax.random.PRNGKey(2), (B, 3), minval=-1, maxval=1)

    ref_states, ref_obs, ref_r, ref_d, _ = jax.jit(env.batch_step)(bank, states, actions)

    with mesh:
        sh_states = shard_env_axis(states, mesh)
        sh_bank = replicate(bank, mesh)
        sh_actions = jax.device_put(actions, env_sharding(mesh))
        out_states, out_obs, out_r, out_d, _ = jax.jit(env.batch_step)(
            sh_bank, sh_states, sh_actions)
        assert len(out_r.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref_r),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_states.phys.base_pos),
                                   np.asarray(ref_states.phys.base_pos),
                                   rtol=1e-6, atol=1e-6)


def test_sharded_train_iteration(setup):
    env, bank = setup
    mesh = make_mesh(8)
    cfg = PPOConfig(num_envs=16, n_steps=8, batch_size=32, n_epochs=1,
                    total_timesteps=10_000)
    algo = PPO(env, cfg)
    rs = algo.init(bank, jax.random.PRNGKey(3))
    with mesh:
        rs = rs.replace(env_states=shard_env_axis(rs.env_states, mesh),
                        obs=shard_env_axis(rs.obs, mesh),
                        params=replicate(rs.params, mesh),
                        opt_state=replicate(rs.opt_state, mesh))
        sh_bank = replicate(bank, mesh)
        rs2, metrics = algo.train_iteration(rs, sh_bank)
        jax.block_until_ready(metrics["reward_mean"])
    assert np.isfinite(float(metrics["pg_loss"]))
    assert len(rs2.env_states.phys.base_pos.sharding.device_set) == 8


def test_sharded_training_matches_single_device(setup):
    """One full PPO iteration (rollout + GAE + minibatched update) must
    produce the same parameters sharded over 8 devices as on one device —
    the multi-host-equivalence guarantee SURVEY.md §4 calls for."""
    env, bank = setup
    cfg = PPOConfig(num_envs=16, n_steps=8, batch_size=32, n_epochs=1,
                    total_timesteps=10_000)
    algo = PPO(env, cfg)
    rs = algo.init(bank, jax.random.PRNGKey(3))

    ref, ref_metrics = algo.train_iteration(rs, bank)
    jax.block_until_ready(ref_metrics["reward_mean"])

    mesh = make_mesh(8)
    with mesh:
        sh = rs.replace(env_states=shard_env_axis(rs.env_states, mesh),
                        obs=shard_env_axis(rs.obs, mesh),
                        params=replicate(rs.params, mesh),
                        opt_state=replicate(rs.opt_state, mesh))
        sh2, sh_metrics = algo.train_iteration(sh, replicate(bank, mesh))
        jax.block_until_ready(sh_metrics["reward_mean"])

    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(sh2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    assert float(ref_metrics["pg_loss"]) == pytest.approx(
        float(sh_metrics["pg_loss"]), rel=1e-4, abs=1e-6)
    assert int(ref_metrics["episodes"]) == int(sh_metrics["episodes"])


def test_2d_mesh_training_matches_single_device(setup):
    """A genuine 2-D ('data', 'model') layout: envs shard over 4-way data,
    dense kernels shard their output dim over 2-way model. The iteration
    must reproduce single-device parameters (GSPMD inserts the gathers)."""
    env, bank = setup
    cfg = PPOConfig(num_envs=16, n_steps=8, batch_size=32, n_epochs=1,
                    total_timesteps=10_000)
    algo = PPO(env, cfg)
    rs = algo.init(bank, jax.random.PRNGKey(5))

    ref, ref_metrics = algo.train_iteration(rs, bank)
    jax.block_until_ready(ref_metrics["reward_mean"])

    mesh = make_mesh(8, axis_names=("data", "model"), model_size=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with mesh:
        params = model_parallel_params(rs.params, mesh)
        # at least one kernel must actually be model-sharded
        assert any(len(x.sharding.spec) == 2 and x.sharding.spec[1] == "model"
                   for x in jax.tree.leaves(params)
                   if hasattr(x, "sharding") and x.ndim == 2)
        sh = rs.replace(env_states=shard_env_axis(rs.env_states, mesh),
                        obs=shard_env_axis(rs.obs, mesh),
                        params=params,
                        opt_state=model_parallel_params(rs.opt_state, mesh))
        sh2, sh_metrics = algo.train_iteration(sh, replicate(bank, mesh))
        jax.block_until_ready(sh_metrics["reward_mean"])

    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(sh2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    assert int(ref_metrics["episodes"]) == int(sh_metrics["episodes"])


def test_sharded_checkpoint_save_restore_roundtrip(setup, tmp_path):
    """Sharded save + sharding-aware restore (round-2 advisor finding: the
    previous restore materialized full host arrays per process). A pytree
    with data-sharded and replicated leaves must come back with the SAME
    shardings and values."""
    env, bank = setup
    mesh = make_mesh(8)
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    states, obs = jax.jit(env.batch_reset)(bank, keys)
    tree = {
        "env": shard_env_axis({"obs": obs}, mesh),
        "params": replicate({"w": jnp.arange(12.0).reshape(3, 4)}, mesh),
        "step": jnp.asarray(7, jnp.int32),
    }

    from openballbot_rl_tpu.utils.checkpoint import (restore_checkpoint,
                                                     save_checkpoint)

    save_checkpoint(str(tmp_path / "ck"), tree)
    # restore into a DIFFERENT-VALUED template with the same shardings
    template = jax.tree.map(jnp.zeros_like, tree)
    template = {
        "env": shard_env_axis(template["env"], mesh),
        "params": replicate(template["params"], mesh),
        "step": template["step"],
    }
    back = restore_checkpoint(str(tmp_path / "ck"), template)

    for want, got in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    # shardings survive the roundtrip (restore is NOT host-replicated)
    got_obs = jax.tree.leaves(back["env"])[0]
    assert not got_obs.sharding.is_fully_replicated
    assert back["params"]["w"].sharding.is_fully_replicated


def test_sharded_vision_step_with_cam_tiles_matches_single_device():
    """Round 4: the vision env's aligned camera-tile render (bank.cam_tiles
    row gather) must shard over the env axis like everything else — tiles
    replicate, per-env gathers stay local to each shard."""
    from openballbot_rl_tpu.envs import add_cam_tiles
    from openballbot_rl_tpu.envs.vision import VisionBallbotEnv, VisionParams

    env = VisionBallbotEnv(EnvParams(max_ep_steps=32),
                           VisionParams(height=16, width=16, frame_skip=2))
    gen = create_terrain({"type": "perlin",
                          "config": {"scale": 25.0, "octaves": 2,
                                     "persistence": 0.2, "lacunarity": 2.0}})
    bank = add_cam_tiles(make_terrain_bank(gen, env.model.hfield_n, 2.0,
                                           jax.random.PRNGKey(0), 2))
    mesh = make_mesh(8)
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states, obs = jax.jit(env.batch_reset)(bank, keys)
    actions = jax.random.uniform(jax.random.PRNGKey(2), (B, 3),
                                 minval=-1, maxval=1)

    ref = jax.jit(env.batch_step)(bank, states, actions)
    # step twice so the frame_skip=2 cadence executes a real render
    ref2 = jax.jit(env.batch_step)(bank, ref[0], actions)

    with mesh:
        sh_states = shard_env_axis(states, mesh)
        sh_bank = replicate(bank, mesh)
        sh_actions = jax.device_put(actions, env_sharding(mesh))
        out = jax.jit(env.batch_step)(sh_bank, sh_states, sh_actions)
        out2 = jax.jit(env.batch_step)(sh_bank, out[0], sh_actions)
        assert len(out2[2].sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(out2[1]["rgbd_0"]),
                                   np.asarray(ref2[1]["rgbd_0"]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out2[2]), np.asarray(ref2[2]),
                                   rtol=1e-6, atol=1e-6)
