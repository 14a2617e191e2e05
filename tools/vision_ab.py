"""Vision-step cost attribution, round 5 (VERDICT r4 ask #1 + #7).

The certified numbers: blind 8.72M env steps/s at B=32768 (0.115 us/env)
vs vision 261k at B=1024 (3.8 us/env) — with the in-jit render only
~0.29 ms/step amortized and blind physics ~0.12 ms at that batch. This
tool attributes the remaining ~3 ms/step by A/B-ing FULL rollout scans
(policy in the loop) that differ in exactly one suspect, each inside its
own jit, timed under the forced-execution protocol (every timed rep
device_gets a checksum the whole step graph feeds). Per the round-4
methodology memo, nothing here compares separate un-jitted calls.

Variants (x B sweep):
  blind            proprio-only env, same tile bank, policy on proprio obs
  blind_nopolicy   same, constant action (no network)
  vis_norender     vision env, do_render=False statically every step:
                   vision state carried, obs dict carries stale features,
                   policy on R^56 — NO render, NO encoder
  vis_full         production dynamic cadence (render 1-in-6 + encoder)
  vis_every        do_render=True every step (isolates render+encode cost)

Attribution identities:
  vision-carry+obs+policy-width overhead = vis_norender - blind
  amortized render+encode                = vis_full - vis_norender
  per-render render+encode               = (vis_every - vis_norender)
  policy cost                            = blind - blind_nopolicy

Run: tools/run_on_tpu.sh /tmp/vision_ab.log python tools/vision_ab.py
Env: B_LIST=512,1024,2048,4096 T=96 REPS=5
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.envs import (
        add_cam_tiles, make_env_from_config, make_terrain_bank)
    from openballbot_rl_tpu.nn.networks import ActorCritic, sample_action

    B_LIST = [int(b) for b in
              os.environ.get("B_LIST", "512,1024,2048,4096").split(",")]
    T = int(os.environ.get("T", "96"))          # multiple of frame_skip=6
    REPS = int(os.environ.get("REPS", "5"))

    base_cfg = {
        "problem": {"terrain": {"type": "perlin", "config": {
            "scale": 25.0, "octaves": 4, "persistence": 0.2,
            "lacunarity": 2.0}},
            "reward": {"type": "directional",
                       "config": {"target_direction": [0.0, 1.0]}}},
    }
    vis_cfg = dict(base_cfg)
    vis_cfg.update({
        "camera": {"enabled": True, "height": 64, "width": 64,
                   "frame_rate": 90, "disable_rgb": True},
        "frozen_cnn": "outputs/encoders/encoder_r2",
    })

    env_blind, gen = make_env_from_config(base_cfg)
    env_vis, _ = make_env_from_config(vis_cfg)
    bank = add_cam_tiles(make_terrain_bank(
        gen, env_blind.model.hfield_n, 2.0, jax.random.PRNGKey(0), 64))

    net = ActorCritic(use_batchnorm=False)

    def make_rollout(env, use_policy, do_render_mode):
        """do_render_mode: None (blind env), 'dynamic', False, True."""
        is_vision = hasattr(env, "vp")

        # bank is a jit ARGUMENT, not a closure capture: closed-over device
        # arrays are embedded as HLO constants, and the ~300 MB tile+cam-tile
        # bank blows the axon relay's remote_compile body limit (HTTP 413).
        @jax.jit
        def rollout(params, bank, states, obs, key):
            def f(carry, _):
                states, obs, key = carry
                key, k = jax.random.split(key)
                if use_policy:
                    mean, log_std, _ = net.apply(params, obs)
                    actions = jnp.clip(sample_action(k, mean, log_std),
                                       -1, 1)
                else:
                    actions = jnp.full(
                        (jax.tree.leaves(obs)[0].shape[0], 3), 0.1)
                if is_vision:
                    states, obs, reward, done, _ = env.batch_step(
                        bank, states, actions,
                        None if do_render_mode == "dynamic"
                        else do_render_mode)
                else:
                    states, obs, reward, done, _ = env.batch_step(
                        bank, states, actions)
                return (states, obs, key), (reward.mean(), done.sum())

            (states_, obs_, _), (rew, dones) = jax.lax.scan(
                f, (states, obs, key), None, length=T)
            chk = rew.mean() + dones.sum().astype(jnp.float32)
            for leaf in jax.tree.leaves(obs_):
                chk = chk + jnp.sum(leaf.reshape(-1)[:64].astype(jnp.float32))
            return chk

        return rollout

    results = {}
    for B in B_LIST:
        keys = jax.random.split(jax.random.PRNGKey(1), B)
        st_b, obs_b = jax.jit(env_blind.batch_reset)(bank, keys)
        st_v, obs_v = jax.jit(env_vis.batch_reset)(bank, keys)
        p_b = net.init(jax.random.PRNGKey(2),
                       jax.tree.map(lambda x: x[0], obs_b))
        p_v = net.init(jax.random.PRNGKey(2),
                       jax.tree.map(lambda x: x[0], obs_v))

        variants = {
            "blind": (make_rollout(env_blind, True, None), p_b, st_b, obs_b),
            "blind_nopolicy": (make_rollout(env_blind, False, None),
                               p_b, st_b, obs_b),
            "vis_norender": (make_rollout(env_vis, True, False),
                             p_v, st_v, obs_v),
            "vis_full": (make_rollout(env_vis, True, "dynamic"),
                         p_v, st_v, obs_v),
            "vis_every": (make_rollout(env_vis, True, True),
                          p_v, st_v, obs_v),
        }
        row = {}
        for name, (fn, params, st, obs) in variants.items():
            k = jax.random.PRNGKey(3)
            t0 = time.time()
            float(jax.device_get(fn(params, bank, st, obs, k)))  # compile+warm
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(REPS):
                float(jax.device_get(fn(params, bank, st, obs, k)))
            dt = (time.time() - t0) / REPS
            ms_step = dt * 1e3 / T
            row[name] = ms_step
            print(f"[vision_ab] B={B:5d} {name:<16} {ms_step:7.3f} ms/step "
                  f"({B / (dt / T):,.0f} steps/s; compile {compile_s:.0f}s)",
                  flush=True)
        row["overhead_vs_blind"] = row["vis_norender"] - row["blind"]
        row["amortized_render"] = row["vis_full"] - row["vis_norender"]
        row["per_render"] = (row["vis_every"] - row["vis_norender"])
        row["policy"] = row["blind"] - row["blind_nopolicy"]
        results[B] = row
        print(f"[vision_ab] B={B}: carry/obs/policy-width overhead "
              f"{row['overhead_vs_blind']:.3f} ms/step; amortized render "
              f"{row['amortized_render']:.3f}; per-render "
              f"{row['per_render']:.3f}; policy {row['policy']:.3f}",
              flush=True)

    out = os.environ.get("OUT",
                         "outputs/experiments/studies/r5/vision_ab.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"T": T, "reps": REPS, "ms_per_step": results}, f, indent=2)
    print(f"[vision_ab] wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
