#!/usr/bin/env python
"""CPU-vs-TPU numerical tolerance check (SURVEY.md §4: the reference has no
such instrument; this framework's goldens make it possible).

Replays the golden physics trajectories (tests/golden/, generated on CPU)
and the terrain signatures on WHATEVER backend JAX selects, and reports the
max deviation. Run on a TPU host (via tools/run_on_tpu.sh) to measure
cross-device drift; exits nonzero if deviation exceeds the documented
tolerances (pose 2e-3, velocity 5e-2 over 1000 contact-rich fp32 steps —
the same bars the CPU golden test uses).

    tools/run_on_tpu.sh /tmp/parity.log python tools/check_device_parity.py
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
# Contact-rich rigid-body dynamics is chaotic: any fp difference between
# backends (fma contraction, reduction order) grows exponentially along a
# trajectory, so cross-device parity is only assertable short-horizon.
# Tolerances apply at the FIRST golden snapshot (100 steps = 0.2 s); later
# snapshots are reported as informational divergence growth.
POSE_ATOL_100 = 1e-3
VEL_ATOL_100 = 1e-2


def replay(name, tcfg, seed):
    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.physics import (
        ContactParams, init_state, make_model, step)
    from openballbot_rl_tpu.physics.hfield import spawn_height_offset

    m = make_model().as_jnp()
    gen = create_terrain(tcfg)
    terr = jnp.asarray(gen(m.hfield_n, seed=seed), jnp.float32).reshape(
        m.hfield_n, m.hfield_n)
    s = init_state(m, spawn_height_offset(terr, 2.0))
    stepf = jax.jit(functools.partial(step, m, ContactParams(), terr, 2.0))
    torques = jax.random.uniform(jax.random.PRNGKey(42), (1000, 3),
                                 minval=-3.0, maxval=3.0)

    @jax.jit
    def chunk(s, tq):
        return jax.lax.scan(lambda s, t: (stepf(s, t), None), s, tq)[0]

    snaps = []
    for i in range(10):
        s = chunk(s, torques[i * 100:(i + 1) * 100])
        snaps.append(np.concatenate([
            np.asarray(s.base_pos), np.asarray(s.base_quat),
            np.asarray(s.ball_pos), np.asarray(s.base_vel),
            np.asarray(s.wheel_vel)]))
    return np.stack(snaps)


def main() -> int:
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    golden = np.load(os.path.join(GOLDEN_DIR, "physics_trajectories.npz"))
    ok = True
    for name, tcfg, seed in [
        ("flat", {"type": "flat", "config": {}}, 3),
        ("perlin", {"type": "perlin", "config": {"scale": 25.0, "octaves": 4,
                                                 "persistence": 0.2,
                                                 "lacunarity": 2.0}}, 7),
    ]:
        got = replay(name, tcfg, seed)
        want = golden[name]
        pose = np.abs(got[:, :10] - want[:, :10]).max(axis=1)   # per snapshot
        vel = np.abs(got[:, 10:] - want[:, 10:]).max(axis=1)
        passed = pose[0] <= POSE_ATOL_100 and vel[0] <= VEL_ATOL_100
        ok &= passed
        print(f"{name}: @100 steps pose dev {pose[0]:.2e} "
              f"(tol {POSE_ATOL_100:.0e}), vel dev {vel[0]:.2e} "
              f"(tol {VEL_ATOL_100:.0e}) -> {'OK' if passed else 'FAIL'}")
        print(f"  divergence growth (pose dev @ 100..1000 steps): "
              + " ".join(f"{d:.1e}" for d in pose))

    # terrain generators: compact signatures (layout matches
    # tests/golden/test_goldens.py: stats + probe row at n=65, seed=123)
    import openballbot_rl_tpu  # noqa: F401 — registry side effects
    from openballbot_rl_tpu.core.factories import create_terrain

    tg = np.load(os.path.join(GOLDEN_DIR, "terrain_signatures.npz"))
    worst_t, worst_dev = "", 0.0
    for t in tg.files:
        cfg = {}
        if t == "mixed":
            cfg = {"components": [
                {"type": "perlin", "weight": 0.6, "config": {"scale": 20.0}},
                {"type": "hills", "weight": 0.4, "config": {}}]}
        gen = create_terrain({"type": t, "config": cfg})
        # concrete seed -> hills/mixed compute MT19937 placements eagerly on
        # host, so ALL 13 generators are device-checkable (no pure_callback
        # in the graph; the axon relay cannot execute host callbacks)
        g = np.asarray(gen(65, seed=123), np.float32)
        sig = np.concatenate([[g.mean(), g.std(), g.min(), g.max()],
                              g.reshape(65, 65)[32, ::8]])
        dev = np.abs(sig - tg[t])
        if float(dev.max()) > worst_dev:
            worst_t, worst_dev = t, float(dev.max())
        if t in ("stepped", "terraced"):
            # quantizing terrains: a ~1-ulp cross-device difference at a
            # step boundary flips that texel by a full step height. Allow
            # isolated probe flips; the aggregate stats must still agree.
            flips = int((dev[4:] > 1e-3).sum())
            if float(dev[:2].max()) > 5e-3 or flips > 2:
                ok = False
                print(f"terrain '{t}': stats dev {dev[:2].max():.2e} "
                      f"(tol 5e-03), probe flips {flips} (tol 2) -> FAIL")
        elif float(dev.max()) > 1e-5:
            ok = False
            print(f"terrain '{t}': max signature dev {dev.max():.2e} "
                  f"(tol 1e-05) -> FAIL")
    print(f"terrains: worst dev {worst_dev:.2e} ({worst_t or 'n/a'}), "
          f"tol 1e-05, {len(tg.files)} generators")

    # patch-cached vs direct terrain sampling ON THIS BACKEND: the env's
    # gather-free patch path claims bit-exactness (envs/env.py
    # EnvParams.terrain_patch); its one-hot dots are pinned to
    # Precision.HIGHEST precisely so this holds on TPU, where default-
    # precision dots would bf16-truncate the heights. CPU tests cannot
    # catch that — this check can.
    from openballbot_rl_tpu.envs import BallbotEnv, EnvParams, make_terrain_bank

    gen = create_terrain({"type": "perlin",
                          "config": {"scale": 25.0, "octaves": 4,
                                     "persistence": 0.2, "lacunarity": 2.0}})
    bank = make_terrain_bank(gen, 293, 2.0, jax.random.PRNGKey(0), 2)
    B, T = 4, 200
    outs = {}
    for flag in (True, False):
        env = BallbotEnv(EnvParams(max_ep_steps=70, terrain_patch=flag))
        keys = jax.random.split(jax.random.PRNGKey(2), B)
        states, _ = jax.jit(env.batch_reset)(bank, keys)

        @jax.jit
        def roll(states):
            def f(carry, _):
                st, key = carry
                key, k = jax.random.split(key)
                a = jax.random.uniform(k, (B, 3), minval=-1, maxval=1)
                st, o, r, d, _ = env.batch_step(bank, st, a)
                return (st, key), (st.phys.base_pos, r)
            return jax.lax.scan(f, (states, jax.random.PRNGKey(3)),
                                None, length=T)[1]
        outs[flag] = jax.tree.map(np.asarray, roll(states))
    pdev = np.abs(outs[True][0] - outs[False][0]).max()
    rdev = np.abs(outs[True][1] - outs[False][1]).max()
    patch_ok = pdev == 0.0 and rdev == 0.0
    ok &= patch_ok
    print(f"patch sampler vs direct ({T} steps, B={B}): pos dev {pdev:.2e}, "
          f"reward dev {rdev:.2e} (tol 0 — bitwise) -> "
          f"{'OK' if patch_ok else 'FAIL'}")

    print("DEVICE PARITY:", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
