"""On-device SAC: collect + replay + twin-Q update as one jitted iteration.

The reference's evaluator accepts SAC checkpoints but its repo never ships a
SAC trainer (ballbot_rl/evaluation/evaluate.py:25-48 tries PPO.load then
SAC.load); this framework provides the full off-policy family. TPU-first
design mirrors train/ppo.py: the vectorized env, the replay buffer, and the
gradient updates all live on device inside a single jitted `train_iteration`;
hosts only see scalar metrics, and a checkpoint (RunnerState incl. the
buffer) resumes exactly.

Algorithm follows SB3 SAC defaults: twin Q with min-target, tanh-squashed
Gaussian actor, polyak-averaged target critics (tau 0.005), automatic
entropy temperature tuned toward target entropy -action_dim, Adam 3e-4.
Batched-env adaptation: each iteration collects `n_steps x num_envs`
transitions, then runs `gradient_steps` minibatch updates — the
updates-per-transition ratio is a config knob rather than SB3's
one-update-per-step, which cannot scale to thousands of parallel envs.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from openballbot_rl_tpu.envs.env import BallbotEnv, EnvState, TerrainBank
from openballbot_rl_tpu.nn.networks import (
    SquashedGaussianActor, TwinQ, squashed_sample_and_logp)


@dataclasses.dataclass(frozen=True)
class SACConfig:
    num_envs: int = 128
    n_steps: int = 32                # env steps collected per iteration
    buffer_size: int = 500_000      # transitions (device-resident)
    batch_size: int = 256
    gradient_steps: int = 64        # updates per iteration
    learning_starts: int = 10_000   # transitions before updates begin
    gamma: float = 0.99
    tau: float = 0.005
    learning_rate: float = 3e-4
    ent_coef: str = "auto"          # "auto" or a fixed float (as str ok)
    target_entropy: Optional[float] = None   # None => -action_dim
    total_timesteps: int = 8_000_000
    # Sample only the newest `replay_window` transitions (None = whole
    # buffer). Under a terrain curriculum the data distribution is
    # non-stationary: uniform replay keeps serving easy-terrain transitions
    # whose Q-targets no longer match the current difficulty mix (the
    # 20M-step frontier run collapsed to 0/64 this way — tutorial 17).
    replay_window: Optional[int] = None


@struct.dataclass
class ReplayBuffer:
    """Fixed-capacity ring buffer, struct-of-arrays, fully on device."""
    obs: Dict[str, jnp.ndarray]
    next_obs: Dict[str, jnp.ndarray]
    actions: jnp.ndarray
    rewards: jnp.ndarray
    dones: jnp.ndarray
    ptr: jnp.ndarray        # next write position
    size: jnp.ndarray       # valid entries (<= capacity)

    @staticmethod
    def create(capacity: int, sample_obs: Dict[str, jnp.ndarray],
               action_dim: int) -> "ReplayBuffer":
        zeros_like_obs = jax.tree.map(
            lambda x: jnp.zeros((capacity,) + x.shape, x.dtype), sample_obs)
        return ReplayBuffer(
            obs=zeros_like_obs,
            next_obs=jax.tree.map(jnp.copy, zeros_like_obs),
            actions=jnp.zeros((capacity, action_dim), jnp.float32),
            rewards=jnp.zeros((capacity,), jnp.float32),
            dones=jnp.zeros((capacity,), jnp.float32),
            ptr=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32))

    def add_batch(self, obs, next_obs, actions, rewards, dones
                  ) -> "ReplayBuffer":
        capacity = self.rewards.shape[0]
        n = rewards.shape[0]
        idx = (self.ptr + jnp.arange(n)) % capacity
        return self.replace(
            obs=jax.tree.map(lambda b, x: b.at[idx].set(x), self.obs, obs),
            next_obs=jax.tree.map(lambda b, x: b.at[idx].set(x),
                                  self.next_obs, next_obs),
            actions=self.actions.at[idx].set(actions),
            rewards=self.rewards.at[idx].set(rewards),
            dones=self.dones.at[idx].set(dones),
            ptr=(self.ptr + n) % capacity,
            size=jnp.minimum(self.size + n, capacity))

    def sample_idx(self, key, batch_size: int,
                   window: Optional[int] = None) -> jnp.ndarray:
        """Uniform sample over the whole buffer, or (window set) over the
        newest `window` transitions — ages count back from the write ptr."""
        if window is None:
            return jax.random.randint(key, (batch_size,), 0,
                                      jnp.maximum(self.size, 1))
        capacity = self.dones.shape[0]
        n_avail = jnp.maximum(jnp.minimum(self.size, window), 1)
        age = jax.random.randint(key, (batch_size,), 1, n_avail + 1)
        return (self.ptr - age) % capacity


@struct.dataclass
class SACRunnerState:
    params: Any             # {"actor", "critic", "target", "log_alpha"}
    opt_state: Any          # {"actor", "critic", "alpha"}
    buffer: ReplayBuffer
    env_states: EnvState
    obs: Dict[str, jnp.ndarray]
    key: jnp.ndarray
    global_step: jnp.ndarray


class SAC:
    """Binds env + actor/critic networks + config into jitted fns.

    Same driver interface as PPO (init / train_iteration / evaluate), so
    cli/train.py's loop, checkpointing, curriculum, and eval logging apply
    unchanged.
    """

    def __init__(self, env: BallbotEnv, cfg: SACConfig = SACConfig(),
                 actor: Optional[SquashedGaussianActor] = None,
                 critic: Optional[TwinQ] = None):
        self.env = env
        self.cfg = cfg
        self.actor = actor or SquashedGaussianActor()
        self.critic = critic or TwinQ()
        self.tx = optax.adam(cfg.learning_rate)
        self.auto_ent = str(cfg.ent_coef) == "auto"
        self.target_entropy = (cfg.target_entropy
                               if cfg.target_entropy is not None
                               else -float(self.actor.action_dim))

    # ---------- init ----------
    def init(self, bank: TerrainBank, key) -> SACRunnerState:
        cfg = self.cfg
        k_env, k_actor, k_critic, k_run = jax.random.split(key, 4)
        env_states, obs = self.env.batch_reset(
            bank, jax.random.split(k_env, cfg.num_envs))
        sample_obs = jax.tree.map(lambda x: x[0], obs)
        a_params = self.actor.init(k_actor, sample_obs)
        sample_act = jnp.zeros((self.actor.action_dim,), jnp.float32)
        c_params = self.critic.init(k_critic, sample_obs, sample_act)
        if self.auto_ent:
            log_alpha = jnp.zeros((), jnp.float32)
        else:
            log_alpha = jnp.log(jnp.asarray(float(self.cfg.ent_coef),
                                            jnp.float32))
        params = dict(actor=a_params, critic=c_params,
                      target=jax.tree.map(jnp.copy, c_params),
                      log_alpha=log_alpha)
        opt_state = dict(actor=self.tx.init(a_params),
                         critic=self.tx.init(c_params),
                         alpha=self.tx.init(log_alpha))
        buffer = ReplayBuffer.create(cfg.buffer_size, sample_obs,
                                     self.actor.action_dim)
        return SACRunnerState(params=params, opt_state=opt_state,
                              buffer=buffer, env_states=env_states, obs=obs,
                              key=k_run, global_step=jnp.zeros((), jnp.int32))

    # ---------- collect ----------
    def _collect(self, rs: SACRunnerState, bank: TerrainBank):
        cfg = self.cfg

        def step(carry, _):
            env_states, obs, buffer, key = carry
            key, k_act = jax.random.split(key)
            mean, log_std = self.actor.apply(rs.params["actor"], obs)
            actions, _ = squashed_sample_and_logp(k_act, mean, log_std)
            env_states, next_obs, reward, done, info = self.env.batch_step(
                bank, env_states, actions)
            # auto-reset envs: `next_obs` after a done is the fresh episode's
            # obs, which must NOT bootstrap the old transition — the done
            # mask in the target handles it, matching terminated-never-
            # bootstraps (SURVEY.md §2.5.5: max-steps ends report terminated)
            buffer = buffer.add_batch(obs, next_obs, actions, reward,
                                      done.astype(jnp.float32))
            stats = dict(ep_return=info["episode_return"],
                         ep_len=info["step_counter"], done=done,
                         reward=reward)
            return (env_states, next_obs, buffer, key), stats

        (env_states, obs, buffer, key), stats = jax.lax.scan(
            step, (rs.env_states, rs.obs, rs.buffer, rs.key), None,
            length=cfg.n_steps)
        return env_states, obs, buffer, key, stats

    # ---------- losses ----------
    def _critic_loss(self, c_params, params, batch, key):
        cfg = self.cfg
        alpha = jnp.exp(params["log_alpha"])
        mean, log_std = self.actor.apply(params["actor"], batch["next_obs"])
        next_a, next_logp = squashed_sample_and_logp(key, mean, log_std)
        tq1, tq2 = self.critic.apply(params["target"], batch["next_obs"],
                                     next_a)
        target_v = jnp.minimum(tq1, tq2) - alpha * next_logp
        target_q = batch["rewards"] + cfg.gamma * (1.0 - batch["dones"]) \
            * target_v
        target_q = jax.lax.stop_gradient(target_q)
        q1, q2 = self.critic.apply(c_params, batch["obs"], batch["actions"])
        loss = 0.5 * (jnp.mean((q1 - target_q) ** 2)
                      + jnp.mean((q2 - target_q) ** 2))
        return loss, dict(q_value=q1.mean(), critic_loss=loss)

    def _actor_loss(self, a_params, params, batch, key):
        alpha = jnp.exp(params["log_alpha"])
        mean, log_std = self.actor.apply(a_params, batch["obs"])
        a, logp = squashed_sample_and_logp(key, mean, log_std)
        q1, q2 = self.critic.apply(params["critic"], batch["obs"], a)
        loss = jnp.mean(alpha * logp - jnp.minimum(q1, q2))
        return loss, dict(actor_loss=loss, entropy=-logp.mean())

    def _alpha_loss(self, log_alpha, entropy):
        # grad wrt log_alpha of alpha * (entropy - target): pushes alpha up
        # when entropy < target, down otherwise
        return -jnp.exp(log_alpha) * (self.target_entropy - entropy)

    # ---------- update ----------
    def _update(self, params, opt_state, buffer: ReplayBuffer, key):
        cfg = self.cfg

        def one_update(carry, _):
            params, opt_state, key = carry
            key, k_idx, k_c, k_a = jax.random.split(key, 4)
            idx = buffer.sample_idx(k_idx, cfg.batch_size,
                                    window=cfg.replay_window)
            batch = dict(
                obs=jax.tree.map(lambda b: b[idx], buffer.obs),
                next_obs=jax.tree.map(lambda b: b[idx], buffer.next_obs),
                actions=buffer.actions[idx],
                rewards=buffer.rewards[idx],
                dones=buffer.dones[idx])

            grads, c_aux = jax.grad(self._critic_loss, has_aux=True)(
                params["critic"], params, batch, k_c)
            upd, c_opt = self.tx.update(grads, opt_state["critic"],
                                        params["critic"])
            params = {**params,
                      "critic": optax.apply_updates(params["critic"], upd)}

            grads, a_aux = jax.grad(self._actor_loss, has_aux=True)(
                params["actor"], params, batch, k_a)
            upd, a_opt = self.tx.update(grads, opt_state["actor"],
                                        params["actor"])
            params = {**params,
                      "actor": optax.apply_updates(params["actor"], upd)}

            if self.auto_ent:
                ent = jax.lax.stop_gradient(a_aux["entropy"])
                g = jax.grad(self._alpha_loss)(params["log_alpha"], ent)
                upd, al_opt = self.tx.update(g, opt_state["alpha"],
                                             params["log_alpha"])
                params = {**params, "log_alpha": optax.apply_updates(
                    params["log_alpha"], upd)}
            else:
                al_opt = opt_state["alpha"]

            params = {**params, "target": jax.tree.map(
                lambda t, o: (1.0 - cfg.tau) * t + cfg.tau * o,
                params["target"], params["critic"])}
            opt_state = dict(actor=a_opt, critic=c_opt, alpha=al_opt)
            aux = {**c_aux, **a_aux, "alpha": jnp.exp(params["log_alpha"])}
            return (params, opt_state, key), aux

        (params, opt_state, key), auxes = jax.lax.scan(
            one_update, (params, opt_state, key), None,
            length=cfg.gradient_steps)
        return params, opt_state, key, jax.tree.map(lambda x: x.mean(), auxes)

    # ---------- one full iteration ----------
    @partial(jax.jit, static_argnums=0)
    def train_iteration(self, rs: SACRunnerState, bank: TerrainBank
                        ) -> Tuple[SACRunnerState, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        env_states, obs, buffer, key, stats = self._collect(rs, bank)
        global_step = rs.global_step + cfg.n_steps * cfg.num_envs

        def do_update(args):
            params, opt_state, key = args
            return self._update(params, opt_state, buffer, key)

        def skip(args):
            params, opt_state, key = args
            zero = dict(q_value=jnp.zeros(()), critic_loss=jnp.zeros(()),
                        actor_loss=jnp.zeros(()), entropy=jnp.zeros(()),
                        alpha=jnp.exp(rs.params["log_alpha"]))
            return params, opt_state, key, zero

        params, opt_state, key, aux = jax.lax.cond(
            buffer.size >= cfg.learning_starts, do_update, skip,
            (rs.params, rs.opt_state, key))

        done = stats["done"]
        n_done = jnp.maximum(done.sum(), 1)
        lr = jnp.asarray(cfg.learning_rate, jnp.float32)
        metrics = dict(
            # PPO-metric names so cli/train.py's CSV row builder works as-is
            pg_loss=aux["actor_loss"], v_loss=aux["critic_loss"],
            entropy=aux["entropy"], approx_kl=jnp.zeros(()),
            clip_fraction=jnp.zeros(()), lr=lr,
            q_value=aux["q_value"], alpha=aux["alpha"],
            buffer_size=buffer.size.astype(jnp.float32),
            ep_return_mean=jnp.sum(stats["ep_return"] * done) / n_done,
            ep_len_mean=jnp.sum(stats["ep_len"] * done) / n_done,
            episodes=done.sum(), reward_mean=stats["reward"].mean())
        new_rs = SACRunnerState(params=params, opt_state=opt_state,
                                buffer=buffer, env_states=env_states,
                                obs=obs, key=key, global_step=global_step)
        return new_rs, metrics

    def deterministic_action(self, params, obs):
        """Tanh of the actor mean (for eval/video)."""
        actor_params = params["actor"] if "actor" in params else params
        mean, _ = self.actor.apply(actor_params, obs)
        return jnp.tanh(mean)

    # ---------- deterministic evaluation ----------
    @partial(jax.jit, static_argnums=(0, 3, 4))
    def evaluate(self, params, bank: TerrainBank, n_episodes: int,
                 max_steps: int, key) -> Dict[str, jnp.ndarray]:
        """Lockstep batched eval (see eval/evaluate.py module doc)."""
        from openballbot_rl_tpu.eval.evaluate import lockstep_episodes

        actor_params = params["actor"] if "actor" in params else params

        def act(obs):
            mean, _ = self.actor.apply(actor_params, obs)
            return jnp.tanh(mean)

        rets, _, lens = lockstep_episodes(self.env, act, n_episodes,
                                          max_steps, bank, key)
        return dict(mean_reward=rets.mean(), std_reward=rets.std(),
                    mean_ep_length=lens.mean().astype(jnp.float32),
                    survival_rate=(lens >= max_steps).mean(),
                    rewards=rets, lengths=lens)
