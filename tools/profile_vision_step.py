"""Device-trace attribution for the VISION ROLLOUT step (round 4).

Traces N batched render_tiles calls at B envs and prints the top HLO ops
by device time — decides where the remaining vision-render milliseconds
live (polar resample? theta tents? crossing pass? tile gather?).
Run via tools/run_on_tpu.sh.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.envs import add_cam_tiles, make_terrain_bank
    from openballbot_rl_tpu.envs.env import EnvParams
    from openballbot_rl_tpu.envs.vision import VisionBallbotEnv, VisionParams
    from openballbot_rl_tpu.physics import hfield as hf

    B = int(os.environ.get("B", "1024"))
    REPS = int(os.environ.get("REPS", "12"))

    if os.environ.get("PROFILE_ENCODER", "1") == "1":
        # the bench's exact vision env: frozen encoder, latent obs
        from openballbot_rl_tpu.envs import make_env_from_config
        env, _ = make_env_from_config({
            "problem": {"terrain": {"type": "perlin", "config": {
                "scale": 25.0, "octaves": 4, "persistence": 0.2,
                "lacunarity": 2.0}},
                "reward": {"type": "directional",
                           "config": {"target_direction": [0.0, 1.0]}}},
            "camera": {"enabled": True, "height": 64, "width": 64,
                       "frame_rate": 90, "disable_rgb": True},
            "frozen_cnn": "outputs/encoders/encoder_r2",
        })
    else:
        env = VisionBallbotEnv(EnvParams(), VisionParams())
    gen = create_terrain({"type": "perlin", "config": {
        "scale": 25.0, "octaves": 4, "persistence": 0.2, "lacunarity": 2.0}})
    bank = add_cam_tiles(make_terrain_bank(gen, env.model.hfield_n, 2.0,
                                           jax.random.PRNGKey(0), 64))
    n = env.model.hfield_n
    Tc = hf.tiles_per_dim(n, hf.CAM_TILE_SIZE, hf.CAM_TILE_STRIDE)
    he = float(env.model.hfield_half_extent)

    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states, _ = jax.jit(env.batch_reset)(bank, keys)
    core = states.core

    import functools

    from openballbot_rl_tpu.nn.networks import ActorCritic, sample_action

    net = ActorCritic(use_batchnorm=False)
    _, obs0 = jax.jit(env.batch_reset)(bank, keys)
    params = net.init(jax.random.PRNGKey(2), jax.tree.map(lambda x: x[0], obs0))

    @functools.partial(jax.jit, static_argnums=3)
    def render(bank, states, obs, reps):
        def f(carry, _):
            states, obs, key, acc = carry
            key, k = jax.random.split(key)
            mean, log_std, _ = net.apply(params, obs)
            a = jnp.clip(sample_action(k, mean, log_std), -1, 1)
            states, obs, r, d, _ = env.batch_step(bank, states, a)
            for leaf in jax.tree.leaves(obs):
                acc = acc + jnp.sum(leaf.astype(jnp.float32))
            return (states, obs, key, acc + jnp.sum(r)), None
        (states, obs, key, acc), _ = jax.lax.scan(
            f, (states, obs, jax.random.PRNGKey(3), jnp.zeros(())),
            None, length=reps)
        return acc

    float(jax.device_get(render(bank, states, obs0, REPS)))   # warm/compile

    trace_dir = "/tmp/render_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    float(jax.device_get(render(bank, states, obs0, REPS)))
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace produced")
        return 1
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)

    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        args = ev.get("args", {})
        if not args or ("run_id" in args and "hlo_op" not in args):
            continue
        key = args.get("hlo_op") or args.get("long_name") or ev.get("name", "")
        dur = float(ev.get("dur", 0.0))
        if dur <= 0:
            continue
        dur_by_name[key] += dur
        cnt_by_name[key] += 1
        total += dur

    print(f"total traced op time: {total/1e3:.1f} ms over {REPS} renders "
          f"(B={B}) [vision rollout steps]")
    for name, dur in sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{dur/1e3/REPS:9.3f} ms/render x{cnt_by_name[name]:<4} "
              f"{name[:140]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
