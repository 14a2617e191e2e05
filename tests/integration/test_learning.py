"""Learning smoke test: PPO/SAC must actually LEARN on an easy task
(SURVEY.md §4 — the reference never tests training; this guards the whole
collect+update path end to end).

Round-4 tightening (VERDICT r3 weak #6): the old assertion
`late > early - 1e-4` on reward_mean was satisfiable by a no-op — at smoke
scale (~25k steps on flat) reward_mean is pinned at the survival bonus and
does not move even under REAL training (measured: +2e-5 over 30
iterations, inside the no-op noise band). What separates training from a
no-op at this scale is the CRITIC: under real updates PPO's value_mean
climbs from ~0.02 at init toward the ~2.3 discounted survival return
(measured 0.26 -> 1.08 by iteration 12), and SAC's q_value climbs ~0.09 ->
3.7; with frozen parameters (lr ~ 0) both stay at init (~0.02 / ~-0.3).
The assertions below fail for a zeroed-LR run by an order of magnitude.
"""
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

    rewards, values = [], []
    for _ in range(12):
        rs, metrics = algo.train_iteration(rs, bank)
        rewards.append(float(metrics["reward_mean"]))
        values.append(float(metrics["value_mean"]))

    late = np.mean(rewards[-3:])
    v_late = np.mean(values[-3:])
    # the critic must move toward the ~2.3 discounted survival return; a
    # no-op (zeroed LR) leaves it at its ~0.02 init (measured margin ~50x)
    assert v_late > 0.5, (
        f"critic did not learn (value_mean stuck at init): {values}")
    assert v_late > values[0] + 0.3, (
        f"no critic improvement: first {values[0]:.4f} late {v_late:.4f}")
    # the policy must at least hold the survival bonus; random torque
    # thrash loses it
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

    rewards, qs = [], []
    for _ in range(24):
        rs, metrics = algo.train_iteration(rs, bank)
        rewards.append(float(metrics["reward_mean"]))
        qs.append(float(metrics["q_value"]))

    late = np.mean(rewards[-4:])
    q_late = np.mean(qs[-4:])
    # twin-Q must move toward the positive discounted survival return; a
    # no-op leaves it near its ~0 init (measured: real 3.7 vs no-op -0.36)
    assert q_late > 1.0, f"Q did not learn (stuck near init): {qs}"
    assert late > 0.0150, (
        f"policy failed to reach survival-level reward: {rewards}")
