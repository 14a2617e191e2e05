"""A/B the terrain-tap implementations on the chip (round 5, VERDICT #2).

Three full policy-in-the-loop blind rollouts (the bench's exact shape),
identical except EnvParams.terrain_taps:

  onehot        XLA row gather -> HBM -> 24 flat one-hot reductions
  pallas_rows   XLA row gather -> Pallas factorized tap kernel
  pallas_fused  per-env DMA gather + taps inside one Pallas kernel

plus a standalone gather+taps microbench (the isolated supply cost).
All timed under the forced-execution protocol (device_get checksums).
Checksum equality across variants doubles as an on-chip bit-parity check
(the CPU suite pins trajectories; this pins them on the TPU toolchain).

Run: tools/run_on_tpu.sh /tmp/bench_taps.log python tools/bench_taps.py
Env: B=32768 T=100 REPS=4 BLOCKS=256,512
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
        BallbotEnv, EnvParams, make_terrain_bank)
    from openballbot_rl_tpu.nn.networks import ActorCritic, sample_action
    from openballbot_rl_tpu.ops import pallas_taps as pt

    B = int(os.environ.get("B", "32768"))
    T = int(os.environ.get("T", "100"))
    REPS = int(os.environ.get("REPS", "4"))
    BLOCKS = [int(x) for x in os.environ.get("BLOCKS", "256,512").split(",")]

    gen = create_terrain({"type": "perlin", "config": {
        "scale": 25.0, "octaves": 4, "persistence": 0.2, "lacunarity": 2.0}})
    env0 = BallbotEnv(EnvParams())
    bank = make_terrain_bank(gen, env0.model.hfield_n, 2.0,
                             jax.random.PRNGKey(0), 64)
    net = ActorCritic(use_batchnorm=False)
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    # ---- standalone gather+taps microbench (chained, forced) ----
    rng = jax.random.PRNGKey(7)
    flat = jax.random.randint(rng, (B,), 0, bank.tiles.shape[0])
    li0 = jax.random.randint(jax.random.fold_in(rng, 1), (B, 6), 0, 31)
    li1 = jnp.clip(li0 + 1, 0, 31)
    lj0 = jax.random.randint(jax.random.fold_in(rng, 2), (B, 6), 0, 31)
    lj1 = jnp.clip(lj0 + 1, 0, 31)

    def micro(fn, label):
        # tiles is a jit ARGUMENT, not a closure capture: closed-over
        # device arrays are embedded as HLO constants and the ~300 MB
        # bank blows the axon relay's remote_compile body limit (413).
        @jax.jit
        def run(tiles, flat):
            def body(f, _):
                t00, t01, t10, t11 = fn(tiles, f)
                # feed the tap outputs back into the next iteration's
                # indices so nothing is dead and iterations serialize
                f2 = (f + t00[:, 0].astype(jnp.int32) % 3 + 1) \
                    % tiles.shape[0]
                return f2, t00.sum()
            f, s = jax.lax.scan(body, flat, None, length=T)
            return s.sum() + f.sum().astype(jnp.float32)

        t0 = time.time()
        float(jax.device_get(run(bank.tiles, flat)))
        comp = time.time() - t0
        t0 = time.time()
        for _ in range(REPS):
            c = float(jax.device_get(run(bank.tiles, flat)))
        dt = (time.time() - t0) / REPS / T
        print(f"[taps-micro] {label:<24} {dt*1e3:7.3f} ms/step "
              f"(compile {comp:.0f}s, chk {c:.1f})", flush=True)
        return dt * 1e3

    def try_micro(key, fn, label):
        # variants can die in Mosaic (e.g. fused block>256 exhausts the
        # 2 KB sflag semaphore space with its s32[blk] DMA-sem array);
        # record the failure and keep benching the rest
        try:
            results["micro"][key] = micro(fn, label)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"[taps-micro] {label:<24} FAILED: {msg}", flush=True)
            results["micro"][key] = {"error": msg}

    results = {"micro": {}, "env": {}}
    try_micro("onehot",
              lambda tiles, f: pt.taps_reference(jnp.take(tiles, f, axis=0),
                                                 li0, li1, lj0, lj1),
              "xla gather+onehot")
    for blk in BLOCKS:
        try_micro(f"pallas_rows_b{blk}",
                  lambda tiles, f, blk=blk: pt.patch_taps_rows(
                      jnp.take(tiles, f, axis=0), li0, li1, lj0, lj1,
                      block=blk), f"gather+pallas_rows b{blk}")
        try_micro(f"pallas_fused_b{blk}",
                  lambda tiles, f, blk=blk: pt.tile_taps_fused(
                      tiles, f, li0, li1, lj0, lj1, block=blk),
                  f"pallas_fused b{blk}")

    # ---- full env rollout A/B ----
    def env_bench(taps):
        env = BallbotEnv(EnvParams(terrain_taps=taps))
        states, obs = jax.jit(env.batch_reset)(bank, keys)
        params = net.init(jax.random.PRNGKey(2),
                          jax.tree.map(lambda x: x[0], obs))

        # bank as a jit argument (see micro): closure capture 413s the relay
        @jax.jit
        def rollout(params, bank, states, obs, key):
            def f(carry, _):
                states, obs, key = carry
                key, k = jax.random.split(key)
                mean, log_std, _ = net.apply(params, obs)
                a = jnp.clip(sample_action(k, mean, log_std), -1, 1)
                states, obs, r, d, _ = env.batch_step(bank, states, a)
                return (states, obs, key), (r.mean(), d.sum())
            (st, ob, _), (rew, dn) = jax.lax.scan(
                f, (states, obs, key), None, length=T)
            chk = rew.mean() + dn.sum().astype(jnp.float32)
            for leaf in jax.tree.leaves(ob):
                chk = chk + jnp.sum(leaf.reshape(-1)[:64].astype(jnp.float32))
            return chk

        k = jax.random.PRNGKey(3)
        t0 = time.time()
        chk = float(jax.device_get(rollout(params, bank, states, obs, k)))
        comp = time.time() - t0
        t0 = time.time()
        for _ in range(REPS):
            chk = float(jax.device_get(rollout(params, bank, states, obs, k)))
        dt = (time.time() - t0) / REPS / T
        sps = B / dt
        print(f"[taps-env] {taps:<14} {dt*1e3:7.3f} ms/step "
              f"{sps:,.0f} steps/s (compile {comp:.0f}s, chk {chk:.4f})",
              flush=True)
        return {"ms_step": dt * 1e3, "steps_s": sps, "chk": chk}

    for taps in ("onehot", "pallas_rows", "pallas_fused"):
        try:
            results["env"][taps] = env_bench(taps)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"[taps-env] {taps:<14} FAILED: {msg}", flush=True)
            results["env"][taps] = {"error": msg}

    chks = {k: v["chk"] for k, v in results["env"].items() if "chk" in v}
    same = len(set(f"{c:.6f}" for c in chks.values())) == 1
    print(f"[taps-env] checksum parity across variants: "
          f"{'OK' if same else 'MISMATCH ' + str(chks)}", flush=True)

    out = os.environ.get("OUT",
                         "outputs/experiments/studies/r5/bench_taps.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[bench_taps] wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
