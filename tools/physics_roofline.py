"""Measured roofline for the blind env-step path (round-3 task 5).

Decides the fate of the "9.3M gather-free bound" aside: decompose the
batched control step into its actual cost terms ON THE CHIP and report
whether a VMEM-resident terrain kernel could close the gap, or why the
delivered number is the practical ceiling.

Variants (all B envs, T-step lax.scan, policy in the loop unless noted):
  full        — bench.py's rollout (policy + RK4 physics + terrain gathers
                + obs/reward/termination + auto-reset)
  no_policy   — same env step, fixed zero action (policy network removed)
  flat_plane  — physics with a constant-plane sampler (terrain gathers
                REMOVED; everything else identical): the gather-free bound
  gathers     — the 24 terrain taps alone (6 query points x 4 bilinear
                corners) in a scan: the cost the VMEM kernel would attack
  elementwise — synthetic (B,) fma chain matched to the engine's ~1.5k
                scalar ops/step: the pure-compute ceiling

Run via tools/run_on_tpu.sh (TPU) or CPU for a smoke test.
Writes one JSON line per variant + a summary.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_rollout(jax, fn, carry, T, reps=5):
    """Forced-execution timing (round 4): block_until_ready through the
    axon relay does not reliably force execution (bench.py module doc) —
    fetch a scalar that the whole scan feeds into, every rep, inside the
    timed region."""
    import jax.numpy as jnp

    def force(out):
        leaves = jax.tree.leaves(out)
        return float(jax.device_get(sum(jnp.sum(l.astype(jnp.float32))
                                        for l in leaves)))

    force(fn(carry))
    t0 = time.time()
    for _ in range(reps):
        force(fn(carry))
    return (time.time() - t0) / reps


def main() -> int:
    import jax
    import jax.numpy as jnp

    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.envs import (BallbotEnv, EnvParams,
                                         make_terrain_bank)
    from openballbot_rl_tpu.nn.networks import ActorCritic, sample_action
    from openballbot_rl_tpu.physics import ContactParams, make_model, step

    B = int(os.environ.get("ROOFLINE_ENVS", "32768"))
    T = int(os.environ.get("ROOFLINE_STEPS", "100"))

    env = BallbotEnv(EnvParams())
    gen = create_terrain({"type": "perlin", "config": {}})
    bank = make_terrain_bank(gen, env.model.hfield_n, 2.0,
                             jax.random.PRNGKey(0), 64)
    net = ActorCritic(use_batchnorm=False)
    states, obs = jax.jit(env.batch_reset)(
        bank, jax.random.split(jax.random.PRNGKey(1), B))
    params = net.init(jax.random.PRNGKey(2), jax.tree.map(lambda x: x[0], obs))

    results = {}

    def report(name, dt):
        sps = B * T / dt
        results[name] = sps
        print(json.dumps({"variant": name, "env_steps_per_sec": round(sps),
                          "ms_per_batched_step": round(dt / T * 1e3, 3)}))

    # --- full (bench.py path) ---
    # bank rides in the carry: a closed-over tile bank would be serialized
    # into the remote compile payload (HTTP 413 on the axon relay)
    @jax.jit
    def full(carry):
        bank_, st, ob, key = carry

        def f(c, _):
            st, ob, key = c
            key, k = jax.random.split(key)
            mean, log_std, _ = net.apply(params, ob)
            a = jnp.clip(sample_action(k, mean, log_std), -1, 1)
            st, ob, r, d, _ = env.batch_step(bank_, st, a)
            return (st, ob, key), r.mean()
        c, r = jax.lax.scan(f, (st, ob, key), None, length=T)
        return c[0].phys.base_pos, r.mean()

    carry = (bank, states, obs, jax.random.PRNGKey(3))
    report("full", timed_rollout(jax, full, carry, T))

    # --- no_policy ---
    @jax.jit
    def no_policy(carry):
        bank_, st, ob, key = carry

        def f(c, _):
            st, ob, key = c
            a = jnp.zeros((B, 3), jnp.float32)
            st, ob, r, d, _ = env.batch_step(bank_, st, a)
            return (st, ob, key), r.mean()
        c, r = jax.lax.scan(f, (st, ob, key), None, length=T)
        return c[0].phys.base_pos, r.mean()

    report("no_policy", timed_rollout(jax, no_policy, carry, T))

    # --- flat_plane: raw physics scan, constant-plane sampler vs real ---
    m = env.model
    cp = ContactParams()
    phys0 = jax.vmap(lambda s: s.phys)(states)
    zero_a = jnp.zeros((B, 3), jnp.float32)

    import openballbot_rl_tpu.physics.hfield as hf
    tidx = jax.vmap(lambda s: s.terrain_idx)(states)

    def physics_scan(sampler_of_env):
        @jax.jit
        def run(p0):
            def f(p, _):
                def one(s, i):
                    sampler = sampler_of_env(i)
                    return step(m, cp, sampler, 2.0, s, zero_a[0])
                p = jax.vmap(one)(p, tidx)
                return p, p.base_pos[..., 2].mean()
            p, z = jax.lax.scan(f, p0, None, length=T)
            return p.base_pos, z.mean()
        return run

    real = physics_scan(lambda i: hf.make_sampler(
        bank.heights, i, m.hfield_half_extent, 2.0))
    report("physics_real_terrain", timed_rollout(jax, real, phys0, T))

    flat = physics_scan(
        lambda i: (lambda x, y: (jnp.ones_like(x),
                                 jnp.zeros_like(x), jnp.zeros_like(x))))
    report("physics_flat_plane", timed_rollout(jax, flat, phys0, T))

    # --- physics through the one-hot PATCH sampler (static patch, no
    # refresh): isolates the cost of the production gather-free tap path ---
    P = env.params.terrain_patch_size
    c0 = env._patch_center_origin(heights_n := m.hfield_n)
    patches = jax.vmap(lambda i: jax.lax.dynamic_slice(
        bank.heights, (i, c0, c0), (1, P, P))[0])(tidx)
    pij = jnp.array([c0, c0], jnp.int32)

    @jax.jit
    def patch_run(p0):
        def f(p, _):
            def one(s, patch):
                sampler = hf.make_patch_sampler(patch, pij, heights_n,
                                                m.hfield_half_extent, 2.0)
                return step(m, cp, sampler, 2.0, s, zero_a[0])
            p = jax.vmap(one)(p, patches)
            return p, p.base_pos[..., 2].mean()
        p, z = jax.lax.scan(f, p0, None, length=T)
        return p.base_pos, z.mean()

    report("physics_patch_sampler", timed_rollout(jax, patch_run, phys0, T))

    # --- full env step with the DIRECT (non-patch) sampler, for an
    # apples-to-apples env comparison ---
    env_direct = BallbotEnv(EnvParams(terrain_patch=False))
    states_d, obs_d = jax.jit(env_direct.batch_reset)(
        bank, jax.random.split(jax.random.PRNGKey(1), B))

    @jax.jit
    def full_direct(carry):
        bank_, st, ob, key = carry

        def f(c, _):
            st, ob, key = c
            a = jnp.zeros((B, 3), jnp.float32)
            st, ob, r, d, _ = env_direct.batch_step(bank_, st, a)
            return (st, ob, key), r.mean()
        c, r = jax.lax.scan(f, (st, ob, key), None, length=T)
        return c[0].phys.base_pos, r.mean()

    report("env_direct_sampler",
           timed_rollout(jax, full_direct,
                         (bank, states_d, obs_d, jax.random.PRNGKey(3)), T))

    # --- gathers alone: 6 query points x 4 taps, like _sample_planes ---
    heights = bank.heights
    n = heights.shape[-1]
    key = jax.random.PRNGKey(7)
    qx = jax.random.uniform(key, (B, 6), minval=0.0, maxval=float(n - 2))
    qi = jax.vmap(lambda s: s.terrain_idx)(states)

    @jax.jit
    def gathers(carry):
        def f(c, _):
            x = c
            i0 = jnp.floor(x).astype(jnp.int32)
            acc = 0.0
            for di in (0, 1):
                for dj in (0, 1):
                    acc = acc + heights[qi[:, None], i0 + di,
                                        jnp.minimum(i0 + dj, n - 1)]
            x = x + (acc.mean() * 1e-12)        # serialize the scan
            return x, acc.mean()
        c, r = jax.lax.scan(f, carry, None, length=T)
        return c, r.mean()

    report("terrain_gathers_only", timed_rollout(jax, gathers, qx, T))

    # --- elementwise ceiling: matched fma chain on (B,) lanes ---
    OPS = int(os.environ.get("ROOFLINE_OPS", "1500"))

    @jax.jit
    def elementwise(carry):
        def f(x, _):
            y = x
            for k in range(OPS // 10):
                y = y * 1.0000001 + 0.0000001
                y = y - y * 3e-9
                y = y * 0.9999999 + 1e-9
                y = y + y * 1e-9
                y = y * 1.0000001 - 1e-9
            return y, y.mean()
        c, r = jax.lax.scan(f, carry, None, length=T)
        return c, r.mean()

    x0 = jnp.ones((B,), jnp.float32)
    report(f"elementwise_{OPS}ops", timed_rollout(jax, elementwise, x0, T))

    # Post-tile decomposition (round 4): the production env samples terrain
    # through the one-hot patch path, so the meaningful split is
    #   full = one-hot-patch physics + env machinery
    #        = flat-plane physics + tap overhead + env machinery
    ms = lambda name: B / results[name] * 1e3      # ms per batched step
    full_ms = ms("full")
    patch_ms = ms("physics_patch_sampler")
    flat_ms = ms("physics_flat_plane")
    env_extra_ms = full_ms - patch_ms
    tap_ms = patch_ms - flat_ms
    print(json.dumps({
        "summary": {
            "B": B, "T": T,
            "full_env_steps_per_sec": round(results["full"]),
            "physics_flat_plane_bound": round(results["physics_flat_plane"]),
            "full_ms": round(full_ms, 3),
            "onehot_tap_overhead_ms": round(tap_ms, 3),
            "env_machinery_ms": round(env_extra_ms, 3),
            "full_if_taps_free_steps": round(B / (full_ms - tap_ms) * 1e3),
            "full_if_env_machinery_free_steps":
                round(B / (full_ms - env_extra_ms) * 1e3),
            "direct_sampler_gather_share_of_physics":
                round(1.0 - results["physics_real_terrain"]
                      / results["physics_flat_plane"], 3),
        }}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
