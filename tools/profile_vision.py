"""Break down where the vision training iteration spends its time on TPU.

Run via tools/run_on_tpu.sh; needs a vision train config (see the cfg load
below -- defaults to the 150M run's config shape).

Times, at B=512 (the 150M vision run's batch):
  1. blind batched env step           (engine baseline)
  2. vision batched env step, no render tick
  3. vision batched env step, render tick (raycast + frozen encoder)
  4. render_patch alone
  5. frozen encoder alone
  6. full PPO train_iteration for the vision config
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import yaml

B = 512


def timeit(label, fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt*1e3:9.3f} ms")
    return dt


def main():
    import sys
    cfg_path = sys.argv[1] if len(sys.argv) > 1 else \
        "configs/train/ppo_vision_curriculum.yaml"
    cfg = yaml.safe_load(open(cfg_path))
    cfg["num_envs"] = B

    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.envs import (
        BallbotEnv, EnvParams, make_env_from_config, make_terrain_bank)
    from openballbot_rl_tpu.train import PPO, PPOConfig

    env, terrain_gen = make_env_from_config(cfg)
    bank = make_terrain_bank(terrain_gen, env.model.hfield_n,
                             env.params.zscale, jax.random.PRNGKey(0), 64)

    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states, obs = jax.jit(env.batch_reset)(bank, keys)
    actions = jnp.zeros((B, 3), jnp.float32)

    # --- 1. blind engine step ---
    blind = BallbotEnv(EnvParams())
    bstates, _ = jax.jit(blind.batch_reset)(bank, keys)
    bstep = jax.jit(lambda s, a: blind.batch_step(bank, s, a))
    t1 = timeit("1. blind batch_step", bstep, bstates, actions)

    # --- 2/3. vision step with/without render (force the cond branch) ---
    step_nr = jax.jit(lambda s, a: jax.vmap(
        lambda ss, aa: env.step(bank, ss, aa, do_render=False))(s, a))
    step_r = jax.jit(lambda s, a: jax.vmap(
        lambda ss, aa: env.step(bank, ss, aa, do_render=True))(s, a))
    t2 = timeit("2. vision batch_step (no render)", step_nr, states, actions)
    t3 = timeit("3. vision batch_step (render tick)", step_r, states, actions)

    # --- 4. render_patch alone (new matmul path vs einsum path) ---
    core = states.core
    rp = jax.jit(lambda c: jax.vmap(lambda cc: env.cams.render_patch(
        bank.heights, cc.terrain_idx, env.model.hfield_half_extent,
        env.params.zscale, cc.phys.base_pos, cc.phys.base_quat,
        cc.phys.ball_pos))(c))
    t4 = timeit("4. render_patch matmul (2 cams)", rp, core)
    rpe = jax.jit(lambda c: jax.vmap(lambda cc: env.cams.render_patch_einsum(
        bank.heights, cc.terrain_idx, env.model.hfield_half_extent,
        env.params.zscale, cc.phys.base_pos, cc.phys.base_quat,
        cc.phys.ball_pos))(c))
    t4e = timeit("4e. render_patch einsum (2 cams)", rpe, core)

    # --- 5. frozen encoder alone ---
    if env.encode_fn is not None:
        imgs = jnp.zeros((B, 2, 1, 64, 64), jnp.float32)
        enc = jax.jit(lambda x: jax.vmap(env.encode_fn)(x))
        t5 = timeit("5. frozen encoder alone", enc, imgs)

    # --- 6. full train iteration ---
    a = cfg["algo"]
    pcfg = PPOConfig(num_envs=B, n_steps=a["n_steps"], batch_size=a["batch_sz"],
                     n_epochs=a["n_epochs"], learning_rate=a["learning_rate"],
                     clip_range=a["clip_range"], vf_coef=a["vf_coef"],
                     ent_coef=a["ent_coef"], weight_decay=a["weight_decay"],
                     total_timesteps=10**9)
    algo = PPO(env, pcfg)
    rs = algo.init(bank, jax.random.PRNGKey(2))
    t6 = timeit("6. PPO train_iteration (256 steps)", algo.train_iteration,
                rs, bank, n=5, warmup=1)
    spi = B * a["n_steps"]
    print(f"\nimplied fps: {spi / t6:,.0f}  (render share "
          f"{(t3 - t2) * a['n_steps'] / 6 / t6:.1%}, "
          f"step share {t2 * a['n_steps'] / t6:.1%})")


main()
