"""PPO algorithm tests: GAE math, update mechanics, schedule, determinism."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openballbot_rl_tpu.core.factories import create_terrain
from openballbot_rl_tpu.envs import BallbotEnv, EnvParams, make_terrain_bank
from openballbot_rl_tpu.train import PPO, PPOConfig, lr_schedule


@pytest.fixture(scope="module")
def algo():
    env = BallbotEnv(EnvParams(max_ep_steps=40))
    gen = create_terrain({"type": "flat", "config": {}})
    bank = make_terrain_bank(gen, env.model.hfield_n, 2.0,
                             jax.random.PRNGKey(0), 1)
    cfg = PPOConfig(num_envs=4, n_steps=16, batch_size=32, n_epochs=2,
                    total_timesteps=10_000)
    return PPO(env, cfg), bank


def test_lr_schedule_breakpoints():
    assert float(lr_schedule(0.9)) == pytest.approx(1e-4)
    assert float(lr_schedule(0.6)) == pytest.approx(5e-5)
    assert float(lr_schedule(0.3)) == pytest.approx(1e-5)


def test_lr_anneal():
    """Round-5 post-curriculum LR anneal: fixed before lr_anneal_start,
    linear to lr_final at the end, off by default."""
    from openballbot_rl_tpu.train.ppo import current_lr

    cfg = PPOConfig(learning_rate=3e-4, lr_anneal_start=0.6, lr_final=3e-5,
                    total_timesteps=100)
    gs = lambda p: jnp.asarray(int(p * 100), jnp.int32)
    assert float(current_lr(cfg, gs(0.0))) == pytest.approx(3e-4)
    assert float(current_lr(cfg, gs(0.6))) == pytest.approx(3e-4)
    assert float(current_lr(cfg, gs(0.8))) == pytest.approx(
        0.5 * (3e-4 + 3e-5), rel=1e-5)
    assert float(current_lr(cfg, gs(1.0))) == pytest.approx(3e-5, rel=1e-5)
    # default: anneal off, fixed LR everywhere
    cfg_off = PPOConfig(learning_rate=3e-4, total_timesteps=100)
    assert float(current_lr(cfg_off, gs(1.0))) == pytest.approx(3e-4)
    # manual reference schedule unaffected (learning_rate <= 0)
    cfg_man = PPOConfig(learning_rate=-1, lr_anneal_start=0.6,
                        total_timesteps=100)
    assert float(current_lr(cfg_man, gs(0.9))) == pytest.approx(1e-5)


def test_gae_against_reference_impl(algo):
    ppo, _ = algo
    T, B = 6, 3
    rng = np.random.default_rng(0)
    reward = rng.standard_normal((T, B)).astype(np.float32)
    value = rng.standard_normal((T, B)).astype(np.float32)
    done = (rng.random((T, B)) < 0.2)
    last_value = rng.standard_normal(B).astype(np.float32)

    adv, ret = ppo._gae({"reward": jnp.asarray(reward),
                         "value": jnp.asarray(value),
                         "done": jnp.asarray(done)}, jnp.asarray(last_value))
    # straightforward python GAE (SB3 buffers.py semantics)
    g, lam = ppo.cfg.gamma, ppo.cfg.gae_lambda
    expected = np.zeros((T, B), np.float32)
    next_adv = np.zeros(B, np.float32)
    next_val = last_value
    for t in reversed(range(T)):
        nonterm = 1.0 - done[t].astype(np.float32)
        delta = reward[t] + g * next_val * nonterm - value[t]
        next_adv = delta + g * lam * nonterm * next_adv
        expected[t] = next_adv
        next_val = value[t]
    np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), expected + value,
                               rtol=1e-5, atol=1e-5)


def test_train_iteration_updates_params(algo):
    ppo, bank = algo
    rs = ppo.init(bank, jax.random.PRNGKey(1))
    rs2, metrics = ppo.train_iteration(rs, bank)
    assert int(rs2.global_step) == ppo.cfg.num_envs * ppo.cfg.n_steps
    # params actually changed
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         rs.params, rs2.params)
    assert max(jax.tree.leaves(diffs)) > 0
    for k in ["pg_loss", "v_loss", "entropy", "approx_kl", "ep_len_mean",
              "lr", "continue_training"]:
        assert k in metrics
    assert float(metrics["lr"]) == pytest.approx(1e-4)  # progress > 0.7


def test_train_iteration_deterministic(algo):
    ppo, bank = algo
    rs = ppo.init(bank, jax.random.PRNGKey(2))
    a, ma = ppo.train_iteration(rs, bank)
    b, mb = ppo.train_iteration(rs, bank)
    np.testing.assert_array_equal(np.asarray(ma["reward_mean"]),
                                  np.asarray(mb["reward_mean"]))
    for la, lb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_evaluate(algo):
    ppo, bank = algo
    rs = ppo.init(bank, jax.random.PRNGKey(3))
    ev = ppo.evaluate(rs.params, bank, 3, 40, jax.random.PRNGKey(4))
    assert ev["rewards"].shape == (3,)
    assert float(ev["mean_ep_length"]) <= 40


def test_target_kl_masks_updates(algo):
    """With a tiny target KL, updates stop after the first minibatch breach."""
    ppo, bank = algo
    import dataclasses
    from openballbot_rl_tpu.train.ppo import PPO as PPOCls
    cfg = dataclasses.replace(ppo.cfg, target_kl=1e-12, clip_range=10.0)
    hot = PPOCls(ppo.env, cfg, ppo.network)
    rs = hot.init(bank, jax.random.PRNGKey(5))
    rs2, metrics = hot.train_iteration(rs, bank)
    assert float(metrics["continue_training"]) == 0.0
