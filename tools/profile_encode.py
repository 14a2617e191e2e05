"""Split the vision render step: render_tiles vs frozen-encoder cost.

Round-5 follow-up to tools/vision_ab.py, which showed the ENTIRE vision
overhead is the render branch (carry/obs/policy overhead ~0) at ~10 ms
per batched render+encode at B=512 — while tools/profile_render.py's
render-only trace said ~1.76 ms at B=1024. This tool times, inside one
jitted scan each (forced-execution protocol):

  render      render_tiles only (depth images out)
  encode      frozen encoder only (on pre-rendered images)
  both        render -> encode (the production render branch)

plus optional encoder dtype variants (f32 vs bf16 compute).

Run: tools/run_on_tpu.sh /tmp/profile_encode.log python tools/profile_encode.py
Env: B_LIST=512,1024 REPS=30
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
    from openballbot_rl_tpu.encoders.training import load_encoder
    from openballbot_rl_tpu.envs import add_cam_tiles, make_terrain_bank
    from openballbot_rl_tpu.envs.env import EnvParams
    from openballbot_rl_tpu.envs.vision import VisionBallbotEnv, VisionParams
    from openballbot_rl_tpu.nn.networks import DepthEncoder
    from openballbot_rl_tpu.physics import hfield as hf

    B_LIST = [int(b) for b in os.environ.get("B_LIST", "512,1024").split(",")]
    REPS = int(os.environ.get("REPS", "30"))

    env = VisionBallbotEnv(EnvParams(), VisionParams())
    gen = create_terrain({"type": "perlin", "config": {
        "scale": 25.0, "octaves": 4, "persistence": 0.2, "lacunarity": 2.0}})
    bank = add_cam_tiles(make_terrain_bank(gen, env.model.hfield_n, 2.0,
                                           jax.random.PRNGKey(0), 64))
    n = env.model.hfield_n
    Tc = hf.tiles_per_dim(n, hf.CAM_TILE_SIZE, hf.CAM_TILE_STRIDE)
    he = float(env.model.hfield_half_extent)

    art = load_encoder("outputs/encoders/encoder_r2")
    variables = {"params": art["params"], "batch_stats": art["batch_stats"]}
    meta = art["meta"]

    def make_encoder(dtype):
        enc = DepthEncoder(meta["latent_dim"],
                           use_batchnorm=meta["use_batchnorm"],
                           padding=meta.get("padding", "SAME"),
                           compute_dtype=dtype)
        return lambda imgs: enc.apply(variables, imgs, train=False)

    def timed(fn, *args, label=""):
        t0 = time.time()
        float(jax.device_get(fn(*args)))
        comp = time.time() - t0
        t0 = time.time()
        for _ in range(REPS):
            float(jax.device_get(fn(*args)))
        # each jitted call scans REPS inner iterations -> per-inner-call ms
        dt = (time.time() - t0) / REPS / REPS
        print(f"[encode] {label:<28} {dt*1e3:8.3f} ms/call "
              f"(compile {comp:.0f}s)", flush=True)
        return dt * 1e3

    results = {}
    for B in B_LIST:
        keys = jax.random.split(jax.random.PRNGKey(1), B)
        states, _ = jax.jit(env.batch_reset)(bank, keys)
        core = states.core

        @jax.jit
        def render_only(bank, core):
            # acc feedback below: without it the scan body is loop-invariant
            # and XLA hoists the whole render out of the loop (this is also
            # why round-4 profile_render under-read the render cost)
            def f(acc, _):
                d = jax.vmap(lambda i, p, q, bp: env.cams.render_tiles(
                    bank.cam_tiles, i, Tc, n, he, 2.0, p, q, bp))(
                    core.terrain_idx, core.phys.base_pos + acc * 1e-30,
                    core.phys.base_quat, core.phys.ball_pos)
                return acc + jnp.sum(d.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(f, jnp.zeros(()), None, length=REPS)
            return acc

        # pre-render one batch of images for the encode-only variants
        imgs = jax.jit(lambda bank, core: jax.vmap(
            lambda i, p, q, bp: env.cams.render_tiles(
                bank.cam_tiles, i, Tc, n, he, 2.0, p, q, bp))(
            core.terrain_idx, core.phys.base_pos, core.phys.base_quat,
            core.phys.ball_pos))(bank, core)[:, :, None, :, :]  # (B,2,1,H,W)

        def make_encode_only(dtype):
            enc = make_encoder(dtype)

            @jax.jit
            def encode_only(imgs):
                def f(acc, _):
                    z = jax.vmap(enc)(imgs + acc * 1e-30)  # serialize reps
                    return acc + jnp.sum(z.astype(jnp.float32)), None
                acc, _ = jax.lax.scan(f, jnp.zeros(()), None, length=REPS)
                return acc
            return encode_only

        def make_both(dtype):
            enc = make_encoder(dtype)

            @jax.jit
            def both(bank, core):
                def f(acc, _):
                    d = jax.vmap(lambda i, p, q, bp: env.cams.render_tiles(
                        bank.cam_tiles, i, Tc, n, he, 2.0, p, q, bp))(
                        core.terrain_idx, core.phys.base_pos + acc * 1e-30,
                        core.phys.base_quat, core.phys.ball_pos)
                    z = jax.vmap(enc)(d[:, :, None, :, :])
                    return acc + jnp.sum(z.astype(jnp.float32)), None
                acc, _ = jax.lax.scan(f, jnp.zeros(()), None, length=REPS)
                return acc
            return both

        row = {}
        row["render"] = timed(render_only, bank, core,
                              label=f"B={B} render_tiles only")
        row["encode_f32"] = timed(make_encode_only(jnp.float32), imgs,
                                  label=f"B={B} encode f32")
        row["encode_bf16"] = timed(make_encode_only(jnp.bfloat16), imgs,
                                   label=f"B={B} encode bf16")
        row["both_f32"] = timed(make_both(jnp.float32), bank, core,
                                label=f"B={B} render+encode f32")
        row["both_bf16"] = timed(make_both(jnp.bfloat16), bank, core,
                                 label=f"B={B} render+encode bf16")
        results[B] = row
        print(f"[encode] B={B}: per-call render {row['render']:.3f} ms, "
              f"encode f32 {row['encode_f32']:.3f} / bf16 "
              f"{row['encode_bf16']:.3f}, both f32 {row['both_f32']:.3f} / "
              f"bf16 {row['both_bf16']:.3f}", flush=True)

    out = os.environ.get("OUT",
                         "outputs/experiments/studies/r5/profile_encode.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"reps": REPS, "ms_per_call": results}, f, indent=2)
    print(f"[profile_encode] wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
