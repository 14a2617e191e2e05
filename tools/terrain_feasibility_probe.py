"""Out-of-engine feasibility probe of the perlin terrain distribution.

Round-3 evidence (VERDICT r2 task 1b): run scripted policies in the
patched-MuJoCo ORACLE (not this repo's engine) on the corrected perlin
distribution at several amplitudes, and record survival under the 20-degree
tilt failure rule (reference `ballbot_env.py:222,987-1017`). If survival is
physically impossible in genuine MuJoCo too, the paper-reproduction gap is a
task-spec property (terrain distribution), not an engine bug.

Calibration anchor: paper Fig. 6 (bottom) shows a RANDOM-INIT policy
surviving ~500 steps at t=0 on the paper's terrain. Whatever amplitude
reproduces ~500-step zero/PID survival here bounds what the paper's
effective terrain could have been.

Run CPU-only:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/terrain_feasibility_probe.py --seeds 6
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from openballbot_rl_tpu.utils.devices import force_cpu  # noqa: E402

force_cpu()

import jax.numpy as jnp  # noqa: E402
import mujoco  # noqa: E402

from openballbot_rl_tpu.controllers.pid import (  # noqa: E402
    pid_act, pid_init, reference_gains)
from openballbot_rl_tpu.core.factories import create_terrain  # noqa: E402
from openballbot_rl_tpu.physics import make_model  # noqa: E402
from openballbot_rl_tpu.physics.hfield import spawn_height_offset  # noqa: E402
from tools.mj_patched_oracle import PatchedSim  # noqa: E402


def make_terrain(seed: int, amplitude: float) -> np.ndarray:
    gen = create_terrain({"type": "perlin", "config": {
        "scale": 25.0, "octaves": 4, "persistence": 0.2, "lacunarity": 2.0,
        "amplitude": amplitude}})
    m = make_model()
    return np.asarray(gen(m.hfield_n, seed=seed), np.float64)


def run_episode(terrain: np.ndarray | None, policy: str, horizon: int,
                rng: np.random.Generator) -> int:
    sim = PatchedSim(terrain=terrain)
    if terrain is not None:
        n = int(np.sqrt(terrain.size))
        off = float(spawn_height_offset(
            jnp.asarray(terrain.reshape(n, n), jnp.float32), 2.0))
        # reference reset: both free joints rise by the offset
        # (ballbot_env.py:612-616)
        sim.data.qpos[2] += off
        sim.data.qpos[12] += off
        mujoco.mj_forward(sim.model, sim.data)
    params = reference_gains()
    pstate = pid_init()
    survived = 0
    for i in range(horizon):
        if policy == "zero":
            ctrl = np.zeros(3)
        elif policy == "random":
            ctrl = rng.uniform(-1.0, 1.0, size=3)
        elif policy == "pid":
            R = sim.data.xmat[1].reshape(3, 3)
            pstate, act = pid_act(params, pstate, jnp.asarray(R, jnp.float32))
            ctrl = np.asarray(act, np.float64) * -1.0  # env sign flip
        else:
            raise ValueError(policy)
        sim.step(ctrl)
        up = sim.data.xmat[1].reshape(3, 3)[:, 2]
        tilt = np.degrees(np.arccos(np.clip(up[2], -1, 1)))
        survived = i + 1
        if tilt > 20.0:
            break
    return survived


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=6)
    ap.add_argument("--horizon", type=int, default=4000)
    ap.add_argument("--amplitudes", type=float, nargs="*",
                    default=[0.0, 0.1, 0.2, 0.35, 0.5, 1.0])
    ap.add_argument("--policies", nargs="*", default=["zero", "pid"])
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    seeds = rng.integers(0, 10000, size=args.seeds)

    results = []
    for amp in args.amplitudes:
        for policy in args.policies:
            steps = []
            for s in seeds:
                terrain = None if amp == 0.0 else make_terrain(int(s), amp)
                steps.append(run_episode(terrain, policy, args.horizon, rng))
            row = dict(amplitude=amp, policy=policy,
                       survival_median=float(np.median(steps)),
                       survival_mean=float(np.mean(steps)),
                       survival_min=int(np.min(steps)),
                       survival_max=int(np.max(steps)),
                       full_horizon=int(np.sum(np.array(steps)
                                               >= args.horizon)),
                       n=len(steps))
            results.append(row)
            print(json.dumps(row))

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
