"""Quantified physics parity vs the patched-MuJoCo oracle (VERDICT r1 #4).

Three studies, all on UNEVEN (perlin) terrain with every contact type
active (ball<->heightfield + 3x capsule<->sphere omniwheel contacts):

1. STATE-MATCHED ACCELERATIONS: roll the JAX engine under a pseudorandom
   bounded torque sequence; at sampled states, set the oracle to the exact
   same (qpos, qvel) and compare full 15-DoF accelerations
   (oracle qacc via one patched-pipeline Euler step: qacc = (v' - v)/h).
2. CLOSED-LOOP TRACE DIVERGENCE: same initial state, same precomputed
   action sequence, both sims step independently; report state divergence
   envelope over >= 250 steps (0.5 s).
3. REFERENCE PID GAINS (20, 15, 2): run them in the oracle on flat terrain
   — if they fall there too, their failure in this engine is an
   old-MuJoCo-pin artifact, not a bug here (docs/design/parity.md).

Caveats that bound achievable agreement (documented, not hidden):
 * contact models differ: this engine uses regularized compliant contact
   (ContactParams kp/kd from MuJoCo solref/solimp defaults), the oracle
   MuJoCo's soft-constraint solver — equal stiffness parametrization but
   different saturation/friction-cone algebra;
 * the oracle integrates semi-implicit Euler (the contact-frame patch
   cannot survive mj_RungeKutta re-running mj_forward), the engine RK4;
 * an uncontrolled ballbot is an inverted pendulum: closed-loop divergence
   grows exponentially after tipping starts, so the bound is only
   meaningful over the pre-tipping horizon.

Run: python tools/physics_parity_study.py
"""
from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from openballbot_rl_tpu.utils.devices import force_cpu  # noqa: E402

force_cpu()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import mujoco  # noqa: E402

from openballbot_rl_tpu.physics import (  # noqa: E402
    ContactParams, forward, init_state, make_model, step)
from openballbot_rl_tpu.physics.engine import PhysState  # noqa: E402
from openballbot_rl_tpu.physics.hfield import spawn_height_offset  # noqa: E402
from openballbot_rl_tpu.physics.rotations import quat_to_mat  # noqa: E402
from tools.mj_patched_oracle import PatchedSim  # noqa: E402

_BALL_OFF = np.array([0.0, 0.0, -0.14])  # ball COM offset in ball frame


def make_terrain(seed=7, amplitude=0.15):
    from openballbot_rl_tpu.core.factories import create_terrain

    gen = create_terrain({"type": "perlin", "config": {
        "scale": 25.0, "octaves": 4, "persistence": 0.2, "lacunarity": 2.0,
        "amplitude": amplitude}})
    m = make_model()
    return np.asarray(gen(m.hfield_n, seed=seed), np.float64)


def state_to_mj(sim: PatchedSim, s: PhysState) -> None:
    """Write a PhysState into the oracle's qpos/qvel (local ang convention,
    ball free joint at body origin — same mapping as validate_physics.py)."""
    d = sim.data
    R = np.array(quat_to_mat(jnp.asarray(s.base_quat, jnp.float64)))
    Rb = np.array(quat_to_mat(jnp.asarray(s.ball_quat, jnp.float64)))
    d.qpos[0:3] = np.asarray(s.base_pos, np.float64)
    d.qpos[3:7] = np.asarray(s.base_quat, np.float64)
    d.qpos[7:10] = np.asarray(s.wheel_angle, np.float64)
    d.qpos[10:13] = np.asarray(s.ball_pos, np.float64) - Rb @ _BALL_OFF
    d.qpos[13:17] = np.asarray(s.ball_quat, np.float64)
    w = np.asarray(s.base_angvel, np.float64)
    wb = np.asarray(s.ball_angvel, np.float64)
    d.qvel[0:3] = np.asarray(s.base_vel, np.float64)
    d.qvel[3:6] = R.T @ w
    d.qvel[6:9] = np.asarray(s.wheel_vel, np.float64)
    d.qvel[9:12] = np.asarray(s.ball_vel, np.float64) + np.cross(wb, -(Rb @ _BALL_OFF))
    d.qvel[12:15] = Rb.T @ wb
    mujoco.mj_forward(sim.model, sim.data)


def oracle_qacc(sim: PatchedSim, ctrl) -> np.ndarray:
    """One patched-pipeline Euler step; qacc = (qvel' - qvel)/h exactly."""
    v0 = sim.data.qvel.copy()
    sim.step(np.asarray(ctrl, np.float64))
    return (sim.data.qvel - v0) / sim.model.opt.timestep


def my_qacc_in_mj_coords(m, cp, terr_j, s: PhysState, ctrl) -> np.ndarray:
    """JAX engine forward dynamics mapped into the oracle's qacc layout.

    base rot: qacc_local = R^T wd (exact: d/dt(R^T w) = R^T wd since
    w x w = 0); ball rot likewise; ball lin at the body origin:
    a_origin = a_com - wd x (Rb off) - w x (w x (Rb off))."""
    udot, a_ball, alpha_ball = forward(m, cp, terr_j, 2.0, s,
                                       jnp.asarray(ctrl, jnp.float32))
    udot = np.asarray(udot, np.float64)
    a_ball = np.asarray(a_ball, np.float64)
    alpha = np.asarray(alpha_ball, np.float64)
    R = np.array(quat_to_mat(jnp.asarray(s.base_quat, jnp.float64)))
    Rb = np.array(quat_to_mat(jnp.asarray(s.ball_quat, jnp.float64)))
    wb = np.asarray(s.ball_angvel, np.float64)
    r = Rb @ _BALL_OFF   # COM -> origin offset is -r; origin - com = -r
    qacc = np.zeros(15)
    qacc[0:3] = udot[0:3]
    qacc[3:6] = R.T @ udot[3:6]
    qacc[6:9] = udot[6:9]
    qacc[9:12] = a_ball + np.cross(alpha, -r) + np.cross(wb, np.cross(wb, -r))
    qacc[12:15] = Rb.T @ alpha
    return qacc


def study_state_matched(n_probe=50, window=10, seed=7, amplitude=0.15):
    """State-matched IMPULSE agreement on uneven terrain.

    Why impulse, not instantaneous qacc: the two contact models respond to
    the same geometric state with different instantaneous force profiles —
    this engine is compliant (f = kp*depth + kd*ddepth), MuJoCo solves soft
    constraints; at the keyframe's built-in ~1 cm wheel-ball overlap the
    two laws produce wildly different spike forces that both integrate to
    the same momentum change over a contact timescale. So: at each probe
    state along a torque-driven rollout, set BOTH sims to the matched
    (qpos, qvel), step both `window` steps (20 ms) with the same clamped
    ctrl, and compare the velocity deltas (total impulse/mass) in MuJoCo
    qvel coordinates. The per-DoF error is normalized by the p90 magnitude
    of the oracle's own deltas (contact-rich DoFs dominate)."""
    m = make_model()
    mj_terr = make_terrain(seed, amplitude)
    terr_j = jnp.asarray(mj_terr, jnp.float32).reshape(m.hfield_n, m.hfield_n)
    mm = m.as_jnp()
    cp = ContactParams()
    off = spawn_height_offset(terr_j, 2.0)
    s = init_state(mm, off)
    stepf = jax.jit(functools.partial(step, mm, cp, terr_j, 2.0))
    torques = np.clip(np.asarray(jax.random.uniform(
        jax.random.PRNGKey(0), (1000, 3), minval=-1.0, maxval=1.0)) * 10.0,
        -10.0, 10.0)   # ctrlrange +-10 (ballbot.xml:82-87), both sims

    def my_qvel(st: PhysState) -> np.ndarray:
        state_to_mj(sim_tmp, st)   # reuse the qvel coordinate mapping
        return sim_tmp.data.qvel.copy()

    sim_tmp = PatchedSim(terrain=mj_terr)
    rows = []
    ncon_hist = []
    stride = 1000 // n_probe
    for i in range(1000):
        if i % stride == 0 and i + window < 1000:
            # oracle leg from the matched state
            sim = PatchedSim(terrain=mj_terr)
            state_to_mj(sim, s)
            ncon_hist.append(int(sim.data.ncon))
            v0 = sim.data.qvel.copy()
            for k in range(window):
                sim.step(torques[i + k])
            dv_or = sim.data.qvel - v0

            # engine leg from the same state
            st = s
            for k in range(window):
                st = stepf(st, jnp.asarray(torques[i + k], jnp.float32))
            dv_my = my_qvel(st) - v0
            rows.append((dv_my, dv_or))
        s = stepf(s, jnp.asarray(torques[i], jnp.float32))
        if not np.isfinite(float(s.base_pos[2])) or float(s.base_pos[2]) < -1:
            break

    mine = np.array([r[0] for r in rows])
    orac = np.array([r[1] for r in rows])
    err = np.abs(mine - orac)
    scale = max(float(np.quantile(np.abs(orac), 0.90)), 1e-6)
    rel = err / scale
    out = {
        "probes": len(rows),
        "window_steps": window,
        "ncon_mean": float(np.mean(ncon_hist)),
        "dv_scale_p90": scale,
        "impulse_rel_err_median": float(np.median(rel)),
        "impulse_rel_err_p90": float(np.quantile(rel, 0.90)),
        "impulse_rel_err_max": float(rel.max()),
    }
    print("[state-matched impulse]", json.dumps(out, indent=2))
    return out


def study_closed_loop(n_steps=250, seed=7, amplitude=0.15):
    """Same initial state + same action trace in both sims."""
    m = make_model()
    mj_terr = make_terrain(seed, amplitude)
    terr_j = jnp.asarray(mj_terr, jnp.float32).reshape(m.hfield_n, m.hfield_n)
    mm = m.as_jnp()
    cp = ContactParams()
    off = spawn_height_offset(terr_j, 2.0)
    s = init_state(mm, off)
    sim = PatchedSim(terrain=mj_terr)
    state_to_mj(sim, s)
    stepf = jax.jit(functools.partial(step, mm, cp, terr_j, 2.0))
    torques = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(1), (n_steps, 3), minval=-1.0, maxval=1.0)) * -10.0

    div = []
    for i in range(n_steps):
        sim.step(torques[i])
        s = stepf(s, jnp.asarray(torques[i], jnp.float32))
        Rb = np.array(quat_to_mat(jnp.asarray(s.ball_quat, jnp.float64)))
        ball_origin = np.asarray(s.ball_pos) - Rb @ _BALL_OFF
        div.append(dict(
            t=(i + 1) * 0.002,
            base_pos=float(np.abs(np.asarray(s.base_pos)
                                  - sim.data.qpos[0:3]).max()),
            base_quat=float(min(np.abs(np.asarray(s.base_quat)
                                       - sim.data.qpos[3:7]).max(),
                                np.abs(np.asarray(s.base_quat)
                                       + sim.data.qpos[3:7]).max())),
            ball_pos=float(np.abs(ball_origin - sim.data.qpos[10:13]).max()),
        ))
    out = {
        "steps": n_steps,
        "base_pos_div_125": div[124]["base_pos"],
        "base_pos_div_250": div[249]["base_pos"],
        "base_quat_div_250": div[249]["base_quat"],
        "ball_pos_div_250": div[249]["ball_pos"],
    }
    print("[closed-loop divergence]", json.dumps(out, indent=2))
    return out


def study_reference_pid(n_steps=25000):
    """The reference install check: PID gains (20,15,2) balancing on flat
    terrain (scripts/test_pid.py). Run them in the ORACLE — if modern MuJoCo
    (patched frames, Euler) also falls, the gains' failure in this engine is
    environmental (old-MuJoCo pin), not an engine bug."""
    from openballbot_rl_tpu.controllers.pid import (pid_act, pid_init,
                                                     reference_gains)

    sim = PatchedSim()
    params = reference_gains()
    pstate = pid_init()
    survived = 0
    for i in range(n_steps):
        R = sim.data.xmat[1].reshape(3, 3)  # base body rotation
        pstate, act = pid_act(params, pstate, jnp.asarray(R, jnp.float32))
        sim.step(np.asarray(act, np.float64) * -1.0)  # env sign flip
        # tilt check (ballbot_env.py:987-1017): angle(body z, world z) > 20deg
        up = sim.data.xmat[1].reshape(3, 3)[:, 2]
        tilt = np.degrees(np.arccos(np.clip(up[2], -1, 1)))
        survived = i + 1
        if tilt > 20.0:
            break
    out = {"steps_survived": survived, "horizon": n_steps,
           "balanced": survived >= n_steps}
    print("[reference PID (20,15,2) in oracle]", json.dumps(out))
    return out


if __name__ == "__main__":
    r1 = study_state_matched()
    r2 = study_closed_loop()
    r3 = study_reference_pid()
    print(json.dumps({"state_matched": r1, "closed_loop": r2,
                      "reference_pid": r3}))
