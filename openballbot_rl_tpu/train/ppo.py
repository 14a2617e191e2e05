"""On-device PPO: rollout + GAE + clipped update as one jitted iteration.

Replaces the reference's SB3 PPO loop (ballbot_rl/training/train.py:126-284 +
SB3 internals) with a TPU-first design: the vectorized env, the rollout
buffer, GAE, and the minibatched update all live on device inside a single
jit-compiled `train_iteration`; hosts only see scalar metrics.

Hyperparameter parity (paper Table II / configs/train/ppo_directional.yaml:
29-115): gamma 0.99, GAE lambda 0.95, clip 0.015, ent_coef 0.001, vf_coef 2.0,
batch 256, 5 epochs, n_steps 2048, target-KL 0.3 (early-stop at 1.5x like
SB3), AdamW weight decay 0.01, max_grad_norm 0.5 (SB3 default), advantage
normalization off, manually decayed LR (train/schedules.py).

Semantics notes:
  * SB3's target-KL early stop breaks out of the epoch loop; here the same
    effect is a carried `continue_training` flag that masks the remaining
    minibatch updates (compiled control flow cannot shorten the loop).
  * Terminated episodes never bootstrap (the reference reports max-steps ends
    as terminated too — SURVEY.md §2.5.5), so GAE masks the value at every
    done with (1 - done).
  * Actions are sampled unsquashed (SB3 Gaussian policy); the env clips.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from openballbot_rl_tpu.envs.env import BallbotEnv, EnvState, TerrainBank
from openballbot_rl_tpu.nn.networks import (
    ActorCritic, gaussian_entropy, gaussian_log_prob, sample_action)
from openballbot_rl_tpu.train.schedules import lr_schedule


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    num_envs: int = 10                  # configs/train/ppo_directional.yaml:173
    n_steps: int = 2048
    batch_size: int = 256
    n_epochs: int = 5
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.015
    ent_coef: float = 0.001
    vf_coef: float = 2.0
    target_kl: float = 0.3
    weight_decay: float = 0.01
    max_grad_norm: float = 0.5
    learning_rate: float = -1.0         # -1 => manual schedule
    normalize_advantage: bool = False
    total_timesteps: int = 8_000_000
    # Post-peak LR anneal (round 5): every fixed-LR frontier study decayed
    # 30-60% off its own peak after the curriculum finished
    # (performance.md). With lr_anneal_start in [0, 1), the LR decays
    # LINEARLY from `learning_rate` at that progress fraction to
    # `lr_final` at the end of training (the reference itself decays LR —
    # ballbot_rl/training/schedules.py:4-19; the tuned TPU configs ran
    # fixed 3e-4). -1 = fixed LR (round-4 behavior). Only meaningful with
    # learning_rate > 0.
    lr_anneal_start: float = -1.0
    lr_final: float = 3e-5

    @property
    def minibatches_per_epoch(self) -> int:
        return (self.num_envs * self.n_steps) // self.batch_size


@struct.dataclass
class RunnerState:
    params: Any
    opt_state: Any
    env_states: EnvState
    obs: Dict[str, jnp.ndarray]
    key: jnp.ndarray
    global_step: jnp.ndarray     # int64-ish step counter (int32 fine for 8e6)


def make_optimizer(cfg: PPOConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=1e-4, weight_decay=cfg.weight_decay),
    )


def current_lr(cfg: PPOConfig, global_step):
    if cfg.learning_rate > 0:
        lr = jnp.asarray(cfg.learning_rate, jnp.float32)
        if cfg.lr_anneal_start >= 0:
            progress = global_step.astype(jnp.float32) / cfg.total_timesteps
            f = jnp.clip((progress - cfg.lr_anneal_start)
                         / max(1.0 - cfg.lr_anneal_start, 1e-8), 0.0, 1.0)
            lr = lr * (1.0 - f) + cfg.lr_final * f
        return lr
    progress_remaining = 1.0 - global_step.astype(jnp.float32) / cfg.total_timesteps
    return lr_schedule(progress_remaining)


class PPO:
    """Binds env + network + config into jitted init/train_iteration fns."""

    def __init__(self, env: BallbotEnv, cfg: PPOConfig = PPOConfig(),
                 network: Optional[ActorCritic] = None):
        n_samples = cfg.num_envs * cfg.n_steps
        if n_samples % cfg.batch_size != 0:
            # compiled minibatching needs static shapes; silently dropping
            # the remainder (or SB3's ragged final minibatch) is worse than
            # refusing a misconfiguration
            raise ValueError(
                f"num_envs*n_steps ({n_samples}) must be divisible by "
                f"batch_size ({cfg.batch_size}); adjust n_steps/batch_sz")
        self.env = env
        self.cfg = cfg
        self.network = network or ActorCritic(use_batchnorm=False)
        self.tx = make_optimizer(cfg)

    # ---------- init ----------
    def init(self, bank: TerrainBank, key) -> RunnerState:
        k_env, k_net, k_run = jax.random.split(key, 3)
        env_states, obs = self.env.batch_reset(
            bank, jax.random.split(k_env, self.cfg.num_envs))
        sample_obs = jax.tree.map(lambda x: x[0], obs)
        params = self.network.init(k_net, sample_obs)
        opt_state = self.tx.init(params)
        return RunnerState(params=params, opt_state=opt_state,
                           env_states=env_states, obs=obs, key=k_run,
                           global_step=jnp.zeros((), jnp.int32))

    # ---------- rollout ----------
    def _rollout(self, rs: RunnerState, bank: TerrainBank, phase=None):
        cfg = self.cfg

        def policy_step(carry, do_render):
            env_states, obs, key = carry
            key, k_act = jax.random.split(key)
            mean, log_std, value = self.network.apply(rs.params, obs)
            actions = sample_action(k_act, mean, log_std)
            logp = gaussian_log_prob(mean, log_std, actions)
            if do_render is None:
                env_states, next_obs, reward, done, info = \
                    self.env.batch_step(bank, env_states,
                                        jnp.clip(actions, -1.0, 1.0))
            else:
                env_states, next_obs, reward, done, info = \
                    self.env.batch_step(bank, env_states,
                                        jnp.clip(actions, -1.0, 1.0),
                                        do_render)
            transition = dict(obs=obs, actions=actions, logp=logp,
                              value=value, reward=reward, done=done,
                              ep_return=info["episode_return"],
                              ep_len=info["step_counter"])
            return (env_states, next_obs, key), transition

        if phase is not None and hasattr(self.env, "vp"):
            # vision env with a trace-time render schedule
            # (envs/vision.py blocked_vision_scan). Measured round 4: NOT
            # faster than the dynamic cond (4.34 vs 3.92 ms/step at
            # B=1024) — kept as tested machinery, off by default. phase
            # must equal int(env tick) % frame_skip at entry — the trainer
            # derives it from the host step clock; bit-identical semantics.
            from openballbot_rl_tpu.envs.vision import blocked_vision_scan

            (env_states, last_obs, key), traj = blocked_vision_scan(
                self.env, phase, cfg.n_steps, policy_step,
                (rs.env_states, rs.obs, rs.key))
        else:
            (env_states, last_obs, key), traj = jax.lax.scan(
                lambda c, _: policy_step(c, None),
                (rs.env_states, rs.obs, rs.key), None, length=cfg.n_steps)
        _, _, last_value = self.network.apply(rs.params, last_obs)
        return env_states, last_obs, key, traj, last_value

    # ---------- GAE ----------
    def _gae(self, traj, last_value):
        cfg = self.cfg

        def scan_fn(carry, inp):
            next_adv, next_value = carry
            reward, value, done = inp
            nonterminal = 1.0 - done.astype(jnp.float32)
            delta = reward + cfg.gamma * next_value * nonterminal - value
            adv = delta + cfg.gamma * cfg.gae_lambda * nonterminal * next_adv
            return (adv, value), adv

        (_, _), advantages = jax.lax.scan(
            scan_fn, (jnp.zeros_like(last_value), last_value),
            (traj["reward"], traj["value"], traj["done"]), reverse=True)
        returns = advantages + traj["value"]
        return advantages, returns

    # ---------- update ----------
    def _loss(self, params, batch, clip_range):
        cfg = self.cfg
        mean, log_std, value = self.network.apply(params, batch["obs"])
        logp = gaussian_log_prob(mean, log_std, batch["actions"])
        ratio = jnp.exp(logp - batch["logp"])

        adv = batch["adv"]
        if cfg.normalize_advantage:
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        pg1 = adv * ratio
        pg2 = adv * jnp.clip(ratio, 1.0 - clip_range, 1.0 + clip_range)
        pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))

        v_loss = jnp.mean((batch["ret"] - value) ** 2)
        ent = gaussian_entropy(log_std)
        loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent

        # SB3's approx_kl estimator: mean(ratio - 1 - log(ratio))
        approx_kl = jnp.mean(ratio - 1.0 - (logp - batch["logp"]))
        clipfrac = jnp.mean((jnp.abs(ratio - 1.0) > clip_range).astype(jnp.float32))
        return loss, dict(pg_loss=pg_loss, v_loss=v_loss, entropy=ent,
                          approx_kl=approx_kl, clip_fraction=clipfrac)

    def _update(self, params, opt_state, dataset, key, lr):
        cfg = self.cfg
        n_samples = cfg.num_envs * cfg.n_steps
        n_mb = cfg.minibatches_per_epoch
        grad_fn = jax.grad(self._loss, has_aux=True)

        def epoch_body(carry, _):
            params, opt_state, key, cont = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, n_samples)
            mb_idx = perm[: n_mb * cfg.batch_size].reshape(n_mb, cfg.batch_size)

            def mb_body(carry, idx):
                params, opt_state, cont = carry
                cont_in = cont    # were we still training entering this mb?
                batch = jax.tree.map(lambda x: x[idx], dataset)
                grads, aux = grad_fn(params, batch, cfg.clip_range)
                # SB3 ordering: the KL check runs BEFORE optimizer.step(),
                # so the over-threshold minibatch is never applied and all
                # further updates stop
                cont = jnp.logical_and(
                    cont, aux["approx_kl"] <= 1.5 * cfg.target_kl)

                def do(args):
                    params, opt_state = args
                    updates, opt_state = self.tx.update(grads, opt_state,
                                                        params)
                    return optax.apply_updates(params, updates), opt_state

                params, opt_state = jax.lax.cond(
                    cont, do, lambda a: a, (params, opt_state))
                # SB3 records losses/KL for every minibatch it PROCESSES
                # (including the over-threshold one it breaks on) and none
                # after the break; mask the aux means the same way so
                # progress.csv isn't diluted by never-processed minibatches
                aux["_recorded"] = cont_in.astype(jnp.float32)
                return (params, opt_state, cont), aux

            (params, opt_state, cont), auxes = jax.lax.scan(
                mb_body, (params, opt_state, cont), mb_idx)
            return (params, opt_state, key, cont), auxes

        # set LR for this iteration (manual schedule, train.py:134-136)
        opt_state = _set_lr(opt_state, lr)
        (params, opt_state, key, cont), auxes = jax.lax.scan(
            epoch_body, (params, opt_state, key, jnp.array(True)), None,
            length=cfg.n_epochs)
        rec = auxes.pop("_recorded")
        denom = jnp.maximum(rec.sum(), 1.0)
        metrics = jax.tree.map(lambda x: (x * rec).sum() / denom, auxes)
        metrics["continue_training"] = cont.astype(jnp.float32)
        return params, opt_state, key, metrics

    # ---------- one full iteration ----------
    @partial(jax.jit, static_argnums=(0, 3))
    def train_iteration(self, rs: RunnerState, bank: TerrainBank,
                        phase=None,
                        ) -> Tuple[RunnerState, Dict[str, jnp.ndarray]]:
        """phase: None = dynamic render cadence (the production path); an
        int (vision envs: env tick %% frame_skip at entry, from the host
        step clock) compiles the render schedule statically —
        bit-identical trajectories, measured slightly SLOWER on TPU
        (4.34 vs 3.92 ms/step at B=1024, performance.md) and kept only as
        tested machinery. At most frame_skip distinct phases occur, so
        the jit cache stays small."""
        cfg = self.cfg
        env_states, last_obs, key, traj, last_value = self._rollout(
            rs, bank, phase)
        advantages, returns = self._gae(traj, last_value)

        flat = lambda x: x.reshape((cfg.n_steps * cfg.num_envs,) + x.shape[2:])
        dataset = dict(
            obs=jax.tree.map(flat, traj["obs"]),
            actions=flat(traj["actions"]),
            logp=flat(traj["logp"]),
            adv=flat(advantages),
            ret=flat(returns),
        )

        global_step = rs.global_step + cfg.n_steps * cfg.num_envs
        lr = current_lr(cfg, global_step)
        params, opt_state, key, metrics = self._update(
            rs.params, rs.opt_state, dataset, key, lr)

        # episode stats from the rollout (SB3 rollout/ep_rew_mean analogue)
        done = traj["done"]
        n_done = jnp.maximum(done.sum(), 1)
        metrics.update(
            ep_return_mean=jnp.sum(traj["ep_return"] * done) / n_done,
            ep_len_mean=jnp.sum(traj["ep_len"] * done) / n_done,
            episodes=done.sum(),
            reward_mean=traj["reward"].mean(),
            value_mean=traj["value"].mean(),
            lr=lr,
        )
        new_rs = RunnerState(params=params, opt_state=opt_state,
                             env_states=env_states, obs=last_obs, key=key,
                             global_step=global_step)
        return new_rs, metrics

    def deterministic_action(self, params, obs):
        """Mean action, clipped to the env's action box (for eval/video)."""
        mean, _, _ = self.network.apply(params, obs)
        return jnp.clip(mean, -1.0, 1.0)

    # ---------- deterministic evaluation ----------
    @partial(jax.jit, static_argnums=(0, 3, 4))
    def evaluate(self, params, bank: TerrainBank, n_episodes: int,
                 max_steps: int, key) -> Dict[str, jnp.ndarray]:
        """Run n_episodes deterministic episodes (mean action) BATCHED IN
        LOCKSTEP, mirroring SB3 EvalCallback / evaluate.py:121-163. The
        lockstep runner keeps vision renders on the scalar tick cadence
        (a per-episode while_loop under vmap renders every step); episode
        statistics are unchanged — see eval/evaluate.py module doc."""
        from openballbot_rl_tpu.eval.evaluate import lockstep_episodes

        def act(obs):
            mean, _, _ = self.network.apply(params, obs)
            return jnp.clip(mean, -1.0, 1.0)

        rets, _, lens = lockstep_episodes(self.env, act, n_episodes,
                                          max_steps, bank, key)
        return dict(mean_reward=rets.mean(), std_reward=rets.std(),
                    mean_ep_length=lens.mean().astype(jnp.float32),
                    survival_rate=(lens >= max_steps).mean(),
                    rewards=rets, lengths=lens)


def _set_lr(opt_state, lr):
    """Set the injected learning rate inside the optax chain state."""
    inner = opt_state[1]
    inner = inner._replace(hyperparams={**inner.hyperparams,
                                        "learning_rate": lr})
    return (opt_state[0], inner)
