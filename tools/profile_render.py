"""Device-trace attribution for the batched depth render (round 4).

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
    REPS = int(os.environ.get("REPS", "10"))

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

    @functools.partial(jax.jit, static_argnums=2)
    def render(bank, core, reps):
        def f(acc, _):
            # acc feeds base_pos: without this the body is loop-invariant
            # and XLA hoists the render out of the scan — the round-4 run
            # of this tool traced ONE render amortized over REPS and
            # under-read the cost ~10x (1.76 "ms/render" at B=1024 was
            # really one ~18 ms render / 10 reps)
            d = jax.vmap(lambda i, p, q, bp: env.cams.render_tiles(
                bank.cam_tiles, i, Tc, n, he, 2.0, p, q, bp))(
                core.terrain_idx, core.phys.base_pos + acc * 1e-30,
                core.phys.base_quat, core.phys.ball_pos)
            return acc + jnp.sum(d.astype(jnp.float32)), None   # FULL sum: a sliced accumulator lets XLA dead-code most of the render
        acc, _ = jax.lax.scan(f, jnp.zeros(()), None, length=reps)
        return acc

    float(jax.device_get(render(bank, core, REPS)))   # warm/compile

    trace_dir = "/tmp/render_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    float(jax.device_get(render(bank, core, REPS)))
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
          f"(B={B})")
    for name, dur in sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{dur/1e3/REPS:9.3f} ms/render x{cnt_by_name[name]:<4} "
              f"{name[:140]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
