"""Measure the lax.cond overhead in the vision step (round 4).

Hypothesis under test: a rollout trace appeared to show `conditional.2`
costing ~3.4 ms/step at B=1024 even on keep steps. VERDICT (measured):
the cond is ~free — the trace row was a parent/child double-count; the
static schedule ran slightly SLOWER (4.34 vs 3.92 ms/step,
performance.md post-mortem). A/B three 24-step rollouts inside one
jit each:
  cond      — production batch_step (dynamic scalar cadence cond)
  static    — same steps with the render DECISION made at trace time
              (4 of 24 steps render, same ticks as the cadence), no cond
  nocond0   — static, zero renders (pure step cost floor)
Run via tools/run_on_tpu.sh.
"""
from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from openballbot_rl_tpu.envs import add_cam_tiles, make_env_from_config, \
        make_terrain_bank

    B = int(os.environ.get("B", "1024"))
    T = 24
    env, gen = make_env_from_config({
        "problem": {"terrain": {"type": "perlin", "config": {
            "scale": 25.0, "octaves": 4, "persistence": 0.2,
            "lacunarity": 2.0}},
            "reward": {"type": "directional",
                       "config": {"target_direction": [0.0, 1.0]}}},
        "camera": {"enabled": True, "height": 64, "width": 64,
                   "frame_rate": 90, "disable_rgb": True},
        "frozen_cnn": "outputs/encoders/encoder_r2",
    })
    bank = add_cam_tiles(make_terrain_bank(gen, env.model.hfield_n, 2.0,
                                           jax.random.PRNGKey(0), 64))
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states, obs = jax.jit(env.batch_reset)(bank, keys)
    acts = jnp.zeros((B, 3), jnp.float32)
    fs = env.vp.frame_skip

    @jax.jit
    def roll_cond(bank, states):
        def f(c, _):
            s, acc = c
            s, o, r, d, _ = env.batch_step(bank, s, acts)
            for leaf in jax.tree.leaves(o):
                acc = acc + jnp.sum(leaf.astype(jnp.float32))
            return (s, acc + r.sum()), None
        (s, acc), _ = jax.lax.scan(f, (states, jnp.zeros(())), None, length=T)
        return acc

    def make_static(render_steps):
        @jax.jit
        def roll(bank, states):
            acc = jnp.zeros(())
            s = states
            for t in range(T):
                do = t in render_steps
                s, o, r, d, _ = jax.vmap(
                    lambda st, a: env.step(bank, st, a, do))(s, acts)
                for leaf in jax.tree.leaves(o):
                    acc = acc + jnp.sum(leaf.astype(jnp.float32))
                acc = acc + r.sum()
            return acc
        return roll

    # the cadence renders where (tick0 + 1 + t) % fs == 0; fresh reset ->
    # tick0 = 0 -> t in {5, 11, 17, 23} for fs=6
    render_ts = tuple(t for t in range(T)
                      if (1 + t) % fs == 0)
    roll_static = make_static(frozenset(render_ts))
    roll_nocond = make_static(frozenset())

    def timed(fn, label, check=None):
        out = float(jax.device_get(fn(bank, states)))
        t0 = time.time()
        for _ in range(5):
            out = float(jax.device_get(fn(bank, states)))
        dt = (time.time() - t0) / 5
        print(f"{label:8s}: {dt*1e3/T:7.3f} ms/step  acc={out:.3f}")
        return out

    a = timed(roll_cond, "cond")
    b = timed(roll_static, "static")
    c = timed(roll_nocond, "nocond0")
    print("static == cond bitwise:", a == b)
    return 0


if __name__ == "__main__":
    sys.exit(main())
