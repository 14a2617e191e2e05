"""SAC learner (train/sac.py): replay buffer semantics, squashed-Gaussian
math, and a full jitted train_iteration on the real env."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openballbot_rl_tpu.core.factories import create_terrain
from openballbot_rl_tpu.envs import BallbotEnv, EnvParams, make_terrain_bank
from openballbot_rl_tpu.nn.networks import (
    gaussian_log_prob, squashed_sample_and_logp)
from openballbot_rl_tpu.train.sac import ReplayBuffer, SAC, SACConfig


class TestReplayBuffer:
    def _buf(self, capacity=8):
        sample_obs = {"a": jnp.zeros((3,)), "b": jnp.zeros((2,))}
        return ReplayBuffer.create(capacity, sample_obs, action_dim=3)

    def _batch(self, n, val):
        obs = {"a": jnp.full((n, 3), val), "b": jnp.full((n, 2), val)}
        return dict(obs=obs, next_obs=obs,
                    actions=jnp.full((n, 3), val),
                    rewards=jnp.full((n,), val),
                    dones=jnp.zeros((n,)))

    def test_add_and_size(self):
        buf = self._buf(8)
        buf = buf.add_batch(**self._batch(3, 1.0))
        assert int(buf.size) == 3 and int(buf.ptr) == 3
        assert np.allclose(buf.rewards[:3], 1.0)

    def test_ring_wraparound(self):
        buf = self._buf(8)
        buf = buf.add_batch(**self._batch(6, 1.0))
        buf = buf.add_batch(**self._batch(6, 2.0))   # wraps: writes 6..7,0..3
        assert int(buf.size) == 8 and int(buf.ptr) == 4
        assert np.allclose(buf.rewards[4:6], 1.0)    # oldest survivors
        assert np.allclose(buf.rewards[6:8], 2.0)
        assert np.allclose(buf.rewards[0:4], 2.0)

    def test_sample_within_size(self):
        buf = self._buf(100)
        buf = buf.add_batch(**self._batch(10, 1.0))
        idx = buf.sample_idx(jax.random.PRNGKey(0), 256)
        assert int(idx.max()) < 10 and int(idx.min()) >= 0


class TestSquashedGaussian:
    def test_actions_in_box(self):
        mean = jnp.array([[5.0, -5.0, 0.0]])
        log_std = jnp.zeros((1, 3))
        a, _ = squashed_sample_and_logp(jax.random.PRNGKey(0), mean, log_std)
        assert np.all(np.abs(a) <= 1.0)

    def test_logp_matches_change_of_variables(self):
        # logp(a) = logp_gauss(u) - sum log(1 - tanh(u)^2), computed naively
        key = jax.random.PRNGKey(1)
        mean = jnp.array([0.3, -0.2, 0.1])
        log_std = jnp.array([-0.5, 0.0, 0.2])
        a, logp = squashed_sample_and_logp(key, mean, log_std)
        u = jnp.arctanh(jnp.clip(a, -1 + 1e-6, 1 - 1e-6))
        naive = gaussian_log_prob(mean, log_std, u) \
            - jnp.sum(jnp.log(1.0 - jnp.tanh(u) ** 2 + 1e-12))
        assert float(jnp.abs(logp - naive)) < 1e-3


@pytest.fixture(scope="module")
def sac_setup():
    env = BallbotEnv(EnvParams(max_ep_steps=64))
    gen = create_terrain({"type": "flat"})
    bank = make_terrain_bank(gen, env.model.hfield_n, 2.0,
                             jax.random.PRNGKey(0), 2)
    cfg = SACConfig(num_envs=4, n_steps=8, buffer_size=512, batch_size=32,
                    gradient_steps=4, learning_starts=16)
    algo = SAC(env, cfg)
    rs = algo.init(bank, jax.random.PRNGKey(1))
    return algo, rs, bank


class TestSACTraining:
    def test_iteration_updates_and_metrics(self, sac_setup):
        algo, rs, bank = sac_setup
        rs2, metrics = algo.train_iteration(rs, bank)
        assert int(rs2.global_step) == 32
        assert int(rs2.buffer.size) == 32
        # past learning_starts => params changed
        leaves0 = jax.tree.leaves(rs.params["actor"])
        leaves1 = jax.tree.leaves(rs2.params["actor"])
        assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))
        for k in ("pg_loss", "v_loss", "entropy", "q_value", "alpha",
                  "ep_return_mean", "reward_mean"):
            assert np.isfinite(float(metrics[k])), k

    def test_no_update_before_learning_starts(self, sac_setup):
        algo, rs, bank = sac_setup
        big_start = SAC(algo.env, SACConfig(
            num_envs=4, n_steps=8, buffer_size=512, batch_size=32,
            gradient_steps=4, learning_starts=10_000))
        rs2, _ = big_start.train_iteration(rs, bank)
        for a, b in zip(jax.tree.leaves(rs.params["actor"]),
                        jax.tree.leaves(rs2.params["actor"])):
            assert np.allclose(a, b)

    def test_target_polyak_moves_slowly(self, sac_setup):
        algo, rs, bank = sac_setup
        rs2, _ = algo.train_iteration(rs, bank)
        # target moved, but much less than critic
        c0 = jnp.concatenate([x.ravel() for x in
                              jax.tree.leaves(rs.params["critic"])])
        c1 = jnp.concatenate([x.ravel() for x in
                              jax.tree.leaves(rs2.params["critic"])])
        t0 = jnp.concatenate([x.ravel() for x in
                              jax.tree.leaves(rs.params["target"])])
        t1 = jnp.concatenate([x.ravel() for x in
                              jax.tree.leaves(rs2.params["target"])])
        d_critic = float(jnp.abs(c1 - c0).max())
        d_target = float(jnp.abs(t1 - t0).max())
        assert 0 < d_target < d_critic

    def test_evaluate(self, sac_setup):
        algo, rs, bank = sac_setup
        ev = algo.evaluate(rs.params, bank, 2, 16, jax.random.PRNGKey(3))
        assert ev["rewards"].shape == (2,)
        assert np.isfinite(float(ev["mean_reward"]))

    def test_checkpoint_roundtrip(self, sac_setup, tmp_path):
        from openballbot_rl_tpu.utils.checkpoint import (
            restore_checkpoint, save_checkpoint)

        algo, rs, bank = sac_setup
        rs2, _ = algo.train_iteration(rs, bank)
        save_checkpoint(str(tmp_path / "ck"), rs2)
        rs3 = restore_checkpoint(str(tmp_path / "ck"), rs)
        for a, b in zip(jax.tree.leaves(rs2.params),
                        jax.tree.leaves(rs3.params)):
            assert np.allclose(a, b)
        assert int(rs3.buffer.size) == int(rs2.buffer.size)


class TestReplayWindow:
    def _buf(self, capacity=8):
        sample_obs = {"a": jnp.zeros((3,)), "b": jnp.zeros((2,))}
        return ReplayBuffer.create(capacity, sample_obs, action_dim=3)

    def _batch(self, n, val):
        obs = {"a": jnp.full((n, 3), val), "b": jnp.full((n, 2), val)}
        return dict(obs=obs, next_obs=obs,
                    actions=jnp.full((n, 3), val),
                    rewards=jnp.full((n,), val),
                    dones=jnp.zeros((n,)))

    def test_window_samples_only_newest(self):
        buf = self._buf(8)
        buf = buf.add_batch(**self._batch(6, 1.0))   # slots 0..5 old
        buf = buf.add_batch(**self._batch(2, 2.0))   # slots 6..7 new, ptr=0
        idx = buf.sample_idx(jax.random.PRNGKey(0), 512, window=2)
        assert set(np.asarray(idx).tolist()) <= {6, 7}
        assert np.allclose(buf.rewards[np.asarray(idx)], 2.0)

    def test_window_handles_wraparound(self):
        buf = self._buf(8)
        buf = buf.add_batch(**self._batch(7, 1.0))   # ptr=7
        buf = buf.add_batch(**self._batch(3, 2.0))   # slots 7,0,1; ptr=2
        idx = np.asarray(buf.sample_idx(jax.random.PRNGKey(1), 512, window=3))
        assert set(idx.tolist()) <= {7, 0, 1}
        assert np.allclose(buf.rewards[idx], 2.0)

    def test_window_larger_than_size_is_uniform(self):
        buf = self._buf(100)
        buf = buf.add_batch(**self._batch(10, 1.0))  # ptr=10, size=10
        idx = np.asarray(buf.sample_idx(jax.random.PRNGKey(2), 2048,
                                        window=50))
        assert idx.min() >= 0 and idx.max() <= 9
        assert len(set(idx.tolist())) == 10          # all live slots reachable
