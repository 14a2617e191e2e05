"""Cross-validate the JAX engine against MuJoCo (dev-time oracle).

Checks, in order:
  1. MuJoCo free-joint angular velocity frame convention (empirical).
  2. Mass matrix M(q) vs mj_fullM at random configurations.
  3. Bias forces vs qfrc_bias at random (q, qvel).
  4. Contact-free dynamics: free-fall trajectory comparison (RK4 both sides).

Run: python tools/validate_physics.py
"""
from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.derive_constants import build_spec  # noqa: E402

from openballbot_rl_tpu.physics import make_model  # noqa: E402
from openballbot_rl_tpu.physics.engine import PhysState, _rigid_terms  # noqa: E402
from openballbot_rl_tpu.physics.rotations import quat_to_mat  # noqa: E402

from openballbot_rl_tpu.utils.devices import force_cpu  # noqa: E402

force_cpu()
jax.config.update("jax_enable_x64", True)


def make_mj():
    spec = build_spec()
    model = spec.compile()
    # disable all contacts for dynamics-only comparison
    model.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONTACT
    data = mujoco.MjData(model)
    return model, data


def check_freejoint_convention():
    xml = """<mujoco><worldbody><body name="b" pos="0 0 1" euler="0 0 90">
      <freejoint/><geom type="box" size="0.1 0.2 0.3" density="100"/>
    </body></worldbody></mujoco>"""
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    d.qvel[3:6] = [1.0, 0, 0]
    mujoco.mj_forward(m, d)
    ang_world = d.cvel[m.body("b").id][:3]
    print("freejoint qvel angular (1,0,0) with body yawed 90deg -> world angular:",
          ang_world)
    local = np.allclose(ang_world, [0, 1, 0], atol=1e-9)
    glob = np.allclose(ang_world, [1, 0, 0], atol=1e-9)
    assert local or glob
    return "local" if local else "global"


def rand_state(rng):
    # random but modest orientation/velocities
    def rq():
        q = rng.standard_normal(4)
        return q / np.linalg.norm(q)
    return dict(
        base_pos=rng.uniform(-0.5, 0.5, 3) + [0, 0, 1.5],
        base_quat=rq(),
        wheel_angle=rng.uniform(-3, 3, 3),
        ball_pos=rng.uniform(-0.5, 0.5, 3) + [0, 0, 3.0],
        ball_quat=rq(),
        base_vel=rng.uniform(-1, 1, 3),
        base_angvel=rng.uniform(-2, 2, 3),
        wheel_vel=rng.uniform(-5, 5, 3),
        ball_vel=rng.uniform(-1, 1, 3),
        ball_angvel=rng.uniform(-3, 3, 3),
    )


def to_mj(model, data, st, ang_frame):
    R = np.array(quat_to_mat(jnp.asarray(st["base_quat"])))
    Rb = np.array(quat_to_mat(jnp.asarray(st["ball_quat"])))
    qpos = np.zeros(model.nq)
    qvel = np.zeros(model.nv)
    qpos[0:3] = st["base_pos"]
    qpos[3:7] = st["base_quat"]
    qpos[7:10] = st["wheel_angle"]
    # ball free joint position = ball body origin; our state tracks ball COM.
    # COM offset (0,0,-0.14) in ball frame -> origin = com - R*(offset)
    off = np.array([0, 0, -0.14])
    qpos[10:13] = st["ball_pos"] - Rb @ off
    qpos[13:17] = st["ball_quat"]
    qvel[0:3] = st["base_vel"]
    w = np.asarray(st["base_angvel"], float)
    qvel[3:6] = R.T @ w if ang_frame == "local" else w
    qvel[6:9] = st["wheel_vel"]
    wb = np.asarray(st["ball_angvel"], float)
    # ball origin velocity = com vel + w x (origin - com) = v + w x (-R off)
    qvel[9:12] = st["ball_vel"] + np.cross(wb, -(Rb @ off))
    qvel[12:15] = Rb.T @ wb if ang_frame == "local" else wb
    data.qpos[:] = qpos
    data.qvel[:] = qvel
    mujoco.mj_forward(model, data)
    return R


def jx_state(st):
    return PhysState(**{k: jnp.asarray(v, jnp.float64) for k, v in st.items()})


def check_mass_and_bias(model, data, ang_frame, n_trials=5):
    bb = make_model()
    rng = np.random.default_rng(0)
    for trial in range(n_trials):
        st = rand_state(rng)
        R = to_mj(model, data, st, ang_frame)

        M_mj = np.zeros((model.nv, model.nv))
        mujoco.mj_fullM(model, data, M_mj)
        Mr_mj = M_mj[:9, :9]

        terms = _rigid_terms(bb, jx_state(st), jnp.zeros(3, jnp.float64))
        M_my = np.array(terms.M)

        # convert my world-omega coords to mujoco's (possibly local) coords:
        # u_mj = T^-1 u_my with T = blockdiag(I, R(if local), I)
        T = np.eye(9)
        if ang_frame == "local":
            T[3:6, 3:6] = R  # u_my = T u_mj  (w_world = R w_local)
        M_my_in_mj = T.T @ M_my @ T
        err = np.abs(M_my_in_mj - Mr_mj).max() / max(1e-9, np.abs(Mr_mj).max())
        print(f"[M] trial {trial}: rel err {err:.3e}")
        assert err < 5e-5, (M_my_in_mj - Mr_mj)  # residual = dropped 2e-4 m off-axis wheel-COM term

        # bias: mujoco qfrc_bias includes gravity; mine separates them.
        bias_my = np.array(terms.bias)          # coriolis etc (LHS)
        tau_g = np.array(terms.tau_ext)         # includes gravity (RHS), ctrl=0, damping
        # remove damping part (mujoco puts damping in qfrc_passive, not bias)
        tau_g[6:9] += bb.damping * np.asarray(st["wheel_vel"])
        rhs_my = bias_my - tau_g                # == qfrc_bias in my coords
        bias_mj = data.qfrc_bias[:9].copy()
        rhs_my_in_mj = T.T @ rhs_my
        err_b = np.abs(rhs_my_in_mj - bias_mj).max() / max(1e-6, np.abs(bias_mj).max())
        print(f"[bias] trial {trial}: rel err {err_b:.3e}")
        assert err_b < 5e-4, np.stack([rhs_my_in_mj, bias_mj])  # same off-axis COM approximation

        # ball rows: MuJoCo's free joint is at the body origin (0.14 m above
        # the sphere COM), so its rotational diag carries parallel-axis terms
        # I + m*d^2 about x/y; our engine tracks the COM directly (diag I).
        Mb_mj = M_mj[9:, 9:]
        assert np.allclose(np.diag(Mb_mj)[:3], bb.m_ball)
        d = 0.14
        expected_rot = np.array([bb.I_ball + bb.m_ball * d * d,
                                 bb.I_ball + bb.m_ball * d * d, bb.I_ball])
        assert np.allclose(np.diag(Mb_mj)[3:], expected_rot), np.diag(Mb_mj)[3:]
    print("mass matrix + bias: OK")


def check_freefall(model, data, ang_frame, steps=250):
    """Contact-free trajectory: my RK4 vs MuJoCo RK4 (64-bit both)."""
    from openballbot_rl_tpu.physics import ContactParams, step as jstep
    bb = make_model()
    rng = np.random.default_rng(1)
    st = rand_state(rng)
    to_mj(model, data, st, ang_frame)

    terrain = jnp.full((bb.hfield_n, bb.hfield_n), -50.0, jnp.float64)  # no contact
    cp = ContactParams()
    s = jx_state(st)
    ctrl = jnp.array([1.5, -2.0, 0.7], jnp.float64)

    data.ctrl[:] = np.array(ctrl)
    import functools
    stepf = jax.jit(functools.partial(jstep, bb, cp, terrain, 2.0))
    for _ in range(steps):
        mujoco.mj_step(model, data)
        s = stepf(s, ctrl)

    # compare base pos/quat and wheel angles
    bp_err = np.abs(np.array(s.base_pos) - data.qpos[0:3]).max()
    q_mj = data.qpos[3:7]
    q_my = np.array(s.base_quat)
    if np.dot(q_mj, q_my) < 0:
        q_my = -q_my
    q_err = np.abs(q_my - q_mj).max()
    th_err = np.abs(np.array(s.wheel_angle) - data.qpos[7:10]).max()
    Rb = np.array(quat_to_mat(s.ball_quat))
    ball_origin = np.array(s.ball_pos) - Rb @ np.array([0, 0, -0.14])
    ball_err = np.abs(ball_origin - data.qpos[10:13]).max()
    print(f"[freefall {steps} steps] base_pos err {bp_err:.3e}, quat err {q_err:.3e}, "
          f"wheel err {th_err:.3e}, ball err {ball_err:.3e}")
    # tolerances reflect (a) the dropped 2e-4 m off-axis wheel-COM term and
    # (b) MuJoCo's manifold quaternion integration vs linear-deriv+renormalize
    assert bp_err < 1e-3 and q_err < 1e-3 and th_err < 1e-3 and ball_err < 1e-3
    print("free-fall trajectory: OK")


if __name__ == "__main__":
    ang_frame = check_freejoint_convention()
    print("freejoint angular frame:", ang_frame)
    model, data = make_mj()
    check_mass_and_bias(model, data, ang_frame)
    check_freefall(model, data, ang_frame)
    print("ALL PHYSICS VALIDATION PASSED")
