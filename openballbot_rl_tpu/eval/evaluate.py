"""Deterministic policy evaluation (reference:
ballbot_rl/evaluation/evaluate.py:19-163).

Runs n deterministic episodes (mean action) and reports per-episode total
reward, length, and discounted return with gamma = 0.99999 (evaluate.py:121).
TPU-first: episodes run vmapped under one jit instead of a GUI env loop.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(0, 1, 3, 4))
def _run_episodes(env, apply_fn, params, n_episodes: int, max_steps: int,
                  bank, key, gamma: float = 0.99999):
    def one_episode(key):
        state, obs = env.reset(bank, key)

        def body(carry):
            state, obs, ret, disc_ret, disc, length, done = carry
            mean, _, _ = apply_fn(params, obs)
            state, obs, reward, d, info = env.step(
                bank, state, jnp.clip(mean, -1.0, 1.0))
            ret = ret + reward
            disc_ret = disc_ret + disc * reward
            return (state, obs, ret, disc_ret, disc * gamma, length + 1, d)

        def cond(carry):
            *_, length, done = carry
            return jnp.logical_and(~done, length < max_steps)

        init = (state, obs, jnp.zeros(()), jnp.zeros(()),
                jnp.ones(()), jnp.zeros((), jnp.int32), jnp.array(False))
        _, _, ret, disc_ret, _, length, _ = jax.lax.while_loop(cond, body, init)
        return ret, disc_ret, length

    rets, disc, lens = jax.vmap(one_episode)(jax.random.split(key, n_episodes))
    return rets, disc, lens


def evaluate_policy(env, apply_fn: Callable, params, bank, key,
                    n_episodes: int = 10, max_steps: int = 4000,
                    gamma: float = 0.99999, verbose: bool = True) -> Dict:
    """Evaluate; prints the reference's per-episode + summary report
    (evaluate.py:128-163)."""
    rets, disc, lens = _run_episodes(env, apply_fn, params, n_episodes,
                                     max_steps, bank, key, gamma)
    rets, disc, lens = map(jax.device_get, (rets, disc, lens))
    # survival = ran the full horizon (a tilt failure always ends earlier);
    # at a difficulty frontier episode outcomes are bimodal (tutorial 14),
    # so this is the stable summary statistic, not the mean reward
    survival = float((lens >= max_steps).mean())
    if verbose:
        for i, (r, g, l) in enumerate(zip(rets, disc, lens)):
            print(f"episode {i}: reward {float(r):8.3f}  "
                  f"discounted {float(g):8.3f}  length {int(l)}")
        print(f"mean reward {rets.mean():.3f} +- {rets.std():.3f}  "
              f"mean length {lens.mean():.0f}  "
              f"survival {int(round(survival * len(lens)))}/{len(lens)}")
    return dict(rewards=rets, discounted_returns=disc, lengths=lens,
                mean_reward=float(rets.mean()), std_reward=float(rets.std()),
                mean_ep_length=float(lens.mean()), survival_rate=survival)
