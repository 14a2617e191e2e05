"""A/B the batched depth render: per-env dynamic_slice (render_patch) vs
aligned camera tiles (render_tiles), plus the full vision env step both ways.

Run through tools/run_on_tpu.sh. Round-4 evidence for the renderer tile
supply (VERDICT r3 ask #2); results recorded in docs/guides/performance.md.
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from openballbot_rl_tpu.core.factories import create_terrain
from openballbot_rl_tpu.envs import add_cam_tiles, make_terrain_bank
from openballbot_rl_tpu.envs.vision import VisionBallbotEnv, VisionParams
from openballbot_rl_tpu.envs.env import EnvParams
from openballbot_rl_tpu.physics import hfield as hf

B = int(os.environ.get("B", "1024"))
REPS = int(os.environ.get("REPS", "20"))


def timed(fn, *args):
    out = fn(*args)
    chk = jax.tree.leaves(out)[0]
    float(jax.device_get(jnp.sum(chk)))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    chk = jax.tree.leaves(out)[0]
    float(jax.device_get(jnp.sum(chk)))
    return (time.time() - t0) / REPS


def main():
    env = VisionBallbotEnv(EnvParams(), VisionParams())
    gen = create_terrain({"type": "perlin", "config": {
        "scale": 25.0, "octaves": 4, "persistence": 0.2, "lacunarity": 2.0}})
    bank = make_terrain_bank(gen, env.model.hfield_n, 2.0,
                             jax.random.PRNGKey(0), 64)
    bank_ct = add_cam_tiles(bank)
    n = env.model.hfield_n
    Tc = hf.tiles_per_dim(n, hf.CAM_TILE_SIZE, hf.CAM_TILE_STRIDE)
    he = float(env.model.hfield_half_extent)

    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states, _ = jax.jit(env.batch_reset)(bank, keys)
    core = states.core

    @jax.jit
    def render_slice(bank, core):
        return jax.vmap(lambda i, p, q, bp: env.cams.render_patch(
            bank.heights, i, he, 2.0, p, q, bp))(
            core.terrain_idx, core.phys.base_pos, core.phys.base_quat,
            core.phys.ball_pos)

    @jax.jit
    def render_tiles(bank, core):
        return jax.vmap(lambda i, p, q, bp: env.cams.render_tiles(
            bank.cam_tiles, i, Tc, n, he, 2.0, p, q, bp))(
            core.terrain_idx, core.phys.base_pos, core.phys.base_quat,
            core.phys.ball_pos)

    a = render_slice(bank, core)
    b = render_tiles(bank_ct, core)
    diff = float(jnp.abs(a - b).max())
    dt_slice = timed(render_slice, bank, core)
    dt_tiles = timed(render_tiles, bank_ct, core)
    print(f"B={B} device={jax.devices()[0]}")
    print(f"render_patch (dyn-slice): {dt_slice*1e3:8.2f} ms/batched render")
    print(f"render_tiles (gather)  : {dt_tiles*1e3:8.2f} ms/batched render "
          f"({dt_slice/dt_tiles:.2f}x)  max|diff|={diff:.2e}")

    # full vision env step both ways (render every step for signal)
    acts = jnp.zeros((B, 3), jnp.float32)

    @jax.jit
    def step6(bank, states, acts):
        def f(carry, _):
            s, _ = carry
            s, o, r, d, _ = env.batch_step(bank, s, acts)
            return (s, r), None
        (s, r), _ = jax.lax.scan(f, (states, jnp.zeros(B)), None, length=6)
        return s, r

    dt_step_a = timed(step6, bank, states, acts)
    dt_step_b = timed(step6, bank_ct, states, acts)
    print(f"6-step vision cadence window: slice {dt_step_a*1e3:.2f} ms | "
          f"tiles {dt_step_b*1e3:.2f} ms ({dt_step_a/dt_step_b:.2f}x)")


if __name__ == "__main__":
    main()
