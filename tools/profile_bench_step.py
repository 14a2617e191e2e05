"""Capture a device trace of the headline bench rollout and print the top
HLO ops by total device time (round-3 roofline attribution).

Run via tools/run_on_tpu.sh. Parses the Chrome-trace JSON the profiler
writes, so no TensorBoard needed.
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
    from openballbot_rl_tpu.envs import (BallbotEnv, EnvParams,
                                         make_terrain_bank)
    from openballbot_rl_tpu.nn.networks import ActorCritic, sample_action

    B = int(os.environ.get("BENCH_ENVS", "32768"))
    T = int(os.environ.get("BENCH_STEPS", "50"))

    env = BallbotEnv(EnvParams())
    gen = create_terrain({"type": "perlin", "config": {}})
    bank = make_terrain_bank(gen, env.model.hfield_n, 2.0,
                             jax.random.PRNGKey(0), 64)
    net = ActorCritic(use_batchnorm=False)
    states, obs = jax.jit(env.batch_reset)(
        bank, jax.random.split(jax.random.PRNGKey(1), B))
    params = net.init(jax.random.PRNGKey(2), jax.tree.map(lambda x: x[0], obs))

    # bank as jit argument: a closed-over tile bank would be serialized
    # into the remote compile payload (HTTP 413 on the axon relay)
    @jax.jit
    def rollout(params, bank, states, obs, key):
        def f(carry, _):
            states, obs, key = carry
            key, k = jax.random.split(key)
            mean, log_std, _ = net.apply(params, obs)
            actions = jnp.clip(sample_action(k, mean, log_std), -1, 1)
            states, obs, reward, done, _ = env.batch_step(bank, states, actions)
            return (states, obs, key), reward.mean()
        (states, obs, key), rew = jax.lax.scan(f, (states, obs, key),
                                               None, length=T)
        return states, obs, rew.mean()

    # warm (compile outside the trace)
    out = rollout(params, bank, states, obs, jax.random.PRNGKey(3))
    jax.block_until_ready(out[2])

    trace_dir = "/tmp/bench_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    out = rollout(params, bank, states, obs, jax.random.PRNGKey(4))
    jax.block_until_ready(out[2])
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace produced", glob.glob(f"{trace_dir}/**", recursive=True))
        return 1
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)

    # device-op rows live under TPU pids; accumulate complete events by name
    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        cat = str(ev.get("args", {}).get("group_by", "")) + str(ev.get("cat", ""))
        name = ev.get("name", "")
        # heuristic: XLA op rows carry long_name/hlo metadata in args
        args = ev.get("args", {})
        if not args or ("run_id" in args and "hlo_op" not in args):
            continue
        key = args.get("hlo_op") or args.get("long_name") or name
        dur = float(ev.get("dur", 0.0))
        if dur <= 0:
            continue
        dur_by_name[key] += dur
        cnt_by_name[key] += 1
        total += dur

    top = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:40]
    print(f"total traced op time: {total/1e3:.1f} ms over {T} steps")
    for name, dur in top:
        print(f"{dur/1e3:9.2f} ms  x{cnt_by_name[name]:<6} {name[:140]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
