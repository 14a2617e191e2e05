"""Learning smoke test: PPO improves on an easy task (SURVEY.md §4 — the
reference never tests training; this guards the whole collect+update path
end to end)."""
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_ppo_improves_on_flat():
    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.envs import BallbotEnv, EnvParams, make_terrain_bank
    from openballbot_rl_tpu.train import PPO, PPOConfig

    env = BallbotEnv(EnvParams(max_ep_steps=200))
    gen = create_terrain({"type": "flat", "config": {}})
    bank = make_terrain_bank(gen, env.model.hfield_n, 2.0,
                             jax.random.PRNGKey(0), 2)
    cfg = PPOConfig(num_envs=16, n_steps=128, batch_size=256, n_epochs=2,
                    learning_rate=3e-4, total_timesteps=200_000)
    algo = PPO(env, cfg)
    rs = algo.init(bank, jax.random.PRNGKey(1))

    rewards = []
    for _ in range(12):
        rs, metrics = algo.train_iteration(rs, bank)
        rewards.append(float(metrics["reward_mean"]))

    early = np.mean(rewards[:3])
    late = np.mean(rewards[-3:])
    # the policy must at least hold the survival bonus and gain directional
    # reward; random torque thrash loses both
    assert late > early - 1e-4, (
        f"no learning signal: early {early:.5f} late {late:.5f}, {rewards}")
    assert late > 0.0150, (
        f"policy failed to reach survival-level reward: {rewards}")


def test_sac_improves_on_flat():
    """Same guard for the off-policy learner: collect -> replay -> twin-Q /
    actor / temperature updates must produce a learning signal."""
    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.envs import BallbotEnv, EnvParams, make_terrain_bank
    from openballbot_rl_tpu.train import SAC, SACConfig

    env = BallbotEnv(EnvParams(max_ep_steps=200))
    gen = create_terrain({"type": "flat", "config": {}})
    bank = make_terrain_bank(gen, env.model.hfield_n, 2.0,
                             jax.random.PRNGKey(0), 2)
    cfg = SACConfig(num_envs=16, n_steps=32, buffer_size=50_000,
                    batch_size=128, gradient_steps=16, learning_starts=2_048,
                    total_timesteps=200_000)
    algo = SAC(env, cfg)
    rs = algo.init(bank, jax.random.PRNGKey(1))

    rewards = []
    for _ in range(24):
        rs, metrics = algo.train_iteration(rs, bank)
        rewards.append(float(metrics["reward_mean"]))

    early = np.mean(rewards[:4])
    late = np.mean(rewards[-4:])
    assert late > early - 1e-4, (
        f"no learning signal: early {early:.5f} late {late:.5f}, {rewards}")
    assert late > 0.0150, (
        f"policy failed to reach survival-level reward: {rewards}")
