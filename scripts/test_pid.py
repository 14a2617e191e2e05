#!/usr/bin/env python
"""PID balance smoke test — the documented install sanity check.

Counterpart of reference scripts/test_pid.py:15-69 (flat terrain, PID
balance, 25k-step cap). The GUI is replaced by console telemetry and an
optional raytraced video (--video).
"""
from __future__ import annotations

import argparse
import functools
import sys


def main(steps: int = 25000, terrain: str = "flat", seed: int = 11,
         video: str = "", verbose: bool = True) -> int:
    from openballbot_rl_tpu.utils.devices import force_cpu

    import os
    if os.environ.get("JAX_PLATFORMS", "") == "cpu" or not os.environ.get(
            "PALLAS_AXON_POOL_IPS"):
        force_cpu()

    import jax
    import jax.numpy as jnp

    from openballbot_rl_tpu.controllers import PIDParams, pid_act, pid_init
    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.physics import (
        ContactParams, init_state, make_model, step)
    from openballbot_rl_tpu.physics.hfield import spawn_height_offset
    from openballbot_rl_tpu.physics.rotations import quat_to_mat

    m = make_model().as_jnp()
    cp = ContactParams()
    gen = create_terrain({"type": terrain, "config": {}})
    terr = jnp.asarray(gen(m.hfield_n, seed=seed), jnp.float32).reshape(
        m.hfield_n, m.hfield_n)
    off = spawn_height_offset(terr, 2.0)
    s = init_state(m, off)
    stepf = functools.partial(step, m, cp, terr, 2.0)

    chunk = 1000

    @jax.jit
    def run_chunk(s, ps):
        def f(carry, _):
            s, ps = carry
            R = quat_to_mat(s.base_quat)
            ps, ctrl = pid_act(PIDParams(), ps, R, omega_world=s.base_angvel)
            s = stepf(s, -ctrl)          # env action convention: negate
            tilt_cos = quat_to_mat(s.base_quat)[2, 2]
            return (s, ps), tilt_cos
        (s, ps), tilt_cos = jax.lax.scan(f, (s, ps), None, length=chunk)
        return s, ps, jnp.degrees(jnp.arccos(jnp.clip(tilt_cos, -1, 1))).max()

    ps = pid_init()
    max_tilt = 0.0
    snaps = []
    for i in range(steps // chunk):
        s, ps, tilt = run_chunk(s, ps)
        max_tilt = max(max_tilt, float(tilt))
        if video:
            snaps.append(jax.device_get((s.base_pos, s.base_quat, s.ball_pos)))
        if verbose:
            print(f"  t={2 * (i + 1) * chunk / 1000:5.1f}s  "
                  f"max tilt so far {max_tilt:5.2f} deg  "
                  f"base z {float(s.base_pos[2]):.3f}")
        if max_tilt > 20.0:
            print("FAILED: robot exceeded 20 deg tilt")
            return 1

    if video:
        import numpy as np

        from openballbot_rl_tpu.physics import hfield as hf
        from openballbot_rl_tpu.viz.scene import render_scene, save_video

        sam = hf.make_sampler(terr, None, m.hfield_half_extent, 2.0)
        frames = np.stack([
            np.asarray(render_scene(sam, jnp.asarray(bp), jnp.asarray(q),
                                    jnp.asarray(ball)))
            for bp, q, ball in snaps])
        print("video ->", save_video(frames, video, fps=4))

    print(f"PASSED: balanced {steps} steps ({steps * 0.002:.0f} s sim) on "
          f"'{terrain}', max tilt {max_tilt:.2f} deg < 20 deg")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="PID balance sanity check")
    p.add_argument("--steps", type=int, default=25000)
    p.add_argument("--terrain", default="flat")
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--video", default="")
    sys.exit(main(p.parse_args().steps, p.parse_args().terrain,
                  p.parse_args().seed, p.parse_args().video))
