"""Pure-JAX rigid-body engine specialized for the ballbot mechanism.

Replaces the reference's patched MuJoCo (L0 of SURVEY.md §1) with a TPU-first
formulation: the whole step is a closed-form function of a small fixed-size
state, `vmap`-batched over thousands of envs and integrated with RK4 at 500 Hz
(reference: ballbot.xml:3-5 — dt=0.002, RK4, elliptic friction cone).

Dynamics formulation
--------------------
The robot is a 9-DoF tree: free base (6) + three wheel hinges (3). Because the
wheel capsule COMs lie on their hinge axes, wheel spin moves no mass and the
mass matrix has the block structure

    M = [[ a I3      -[s]x     0    ]          a = total mass
         [ [s]x       C        D    ]          s = R s_body (COM moment)
         [ 0          D^T      E    ]]         E diagonal (+armature)

(generalized coords u = [v_world, w_world, theta_dot]). Rather than factoring
the 9x9 numerically, the solve is reduced in closed form by block elimination:
eliminate v (diagonal), eliminate theta_dot (diagonal), leaving ONE symmetric
3x3 Schur complement S3 = C - [s]x^T[s]x/a - D E^-1 D^T inverted by Cramer.
Bias (Coriolis/gyroscopic) forces come from projecting Newton-Euler body
forces at u_dot = 0 through the body Jacobians. The ball is a separate free
sphere with isotropic inertia. Both are validated against MuJoCo's
mj_fullM / qfrc_bias (tools/validate_physics.py, dev-time oracle).

TPU layout
----------
Everything inside `forward` is *scalarized* (physics/scalar3.py): per-env
quantities are tuples of scalars, so under `vmap` every intermediate is a
(B,) vector riding the 128-wide lane dimension — no (B, 9, 9) padded tiles,
no gather/scatter matrix assembly, and XLA fuses the ~3 kFLOP step into a
few elementwise kernels. The only memory traffic per step is the state
itself plus 4 heightfield taps per RK4 stage.

Contact model
-------------
MuJoCo-style soft constraints evaluated explicitly (per RK4 stage), with the
per-direction effective mass m_eff = 1/(J M^-1 J^T) (diagonal/decoupled
approximation of the Delassus operator):

    f_n = m_eff * (Kp * depth - Kd * v_n),  clamped >= 0
    f_t = -m_eff * Kf * v_t, clamped to the friction cone per tangent axis

with Kp = impedance / timeconst^2, Kd = 2*sqrt(impedance)/timeconst —
i.e. a critically damped constraint-space spring whose stiffness mirrors
MuJoCo's solref=(0.02, 1) / solimp amplification d/(1-d).

Contacts (static set, masked when inactive):
  0      ball <-> heightfield   (isotropic friction mu=1, condim 3)
  1..3   wheel_i capsule <-> ball, with the PATCHED contact frame: first
         tangent = capsule long axis (tools/mujoco_fix.patch:13-16), friction
         (0.001, 1.0) per ballbot.xml:90-92 — the omniwheel model: near-free
         sliding along the roller axis, full grip circumferentially.
  4..8   robot <-> heightfield "fall cases" (tower cylinder as two inscribed
         spheres r=0.11 at its axis ends, each wheel as one bounding sphere
         at its COM — ballbot.xml:40 tower size 0.11 0.14 pos 0 0 0.2).
         Conscious approximation of the reference's cylinder/capsule-hfield
         collisions: it makes a robot that loses the ball land, tip over,
         and trip the >20 deg tilt termination exactly like the reference,
         instead of falling through the world. Wheel COMs sit on their hinge
         axes, so these contacts need no wheel-spin Jacobian entries.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from openballbot_rl_tpu.physics import hfield as hf
from openballbot_rl_tpu.physics import scalar3 as s3
from openballbot_rl_tpu.physics.model import BallbotModel
from openballbot_rl_tpu.physics.rotations import quat_deriv, quat_normalize
from openballbot_rl_tpu.physics.scalar3 import (
    mvec, quat_to_m3, sym3_inv, vadd, vcross, vdot, vnormsq, vscale, vsub)


@struct.dataclass
class PhysState:
    """Physics state for one env (float32). ball_pos is the ball COM."""
    base_pos: jnp.ndarray    # (3,)
    base_quat: jnp.ndarray   # (4,) wxyz
    wheel_angle: jnp.ndarray  # (3,)
    ball_pos: jnp.ndarray    # (3,)
    ball_quat: jnp.ndarray   # (4,)
    base_vel: jnp.ndarray    # (3,) world
    base_angvel: jnp.ndarray  # (3,) world
    wheel_vel: jnp.ndarray   # (3,)
    ball_vel: jnp.ndarray    # (3,) world
    ball_angvel: jnp.ndarray  # (3,) world


@dataclasses.dataclass(frozen=True)
class ContactParams:
    """Soft-constraint parameters (static; closed over by jit)."""
    timeconst: float = 0.02      # MuJoCo default solref[0] (s)
    impedance: float = 16.0      # ~ d/(1-d) amplification, solimp d ~ 0.94
    mu_terrain: float = 1.0      # default MuJoCo sliding friction
    mu_wheel_axis: float = 0.001  # ballbot.xml:90-92 friction[0] (along capsule)
    mu_wheel_perp: float = 1.0    # friction[1] (circumferential grip)
    # Regularized Coulomb friction slope (1/s): tangential force is
    # -m_eff * friction_slope * v_slip, clamped per-axis to mu*f_n. The slope
    # is set near (but inside) RK4's real-axis stability bound 2.78/dt so the
    # Coulomb limit is reached at small slip (good stiction) without blowing
    # up the explicit integrator.
    friction_slope: float = 1000.0

    @property
    def kp(self) -> float:
        return self.impedance / (self.timeconst ** 2)

    @property
    def kd(self) -> float:
        return 2.0 * (self.impedance ** 0.5) / self.timeconst


def init_state(model: BallbotModel, height_offset) -> PhysState:
    """State at the reference keyframe, lifted by `height_offset` (spawn rule)."""
    z = jnp.asarray(height_offset, dtype=jnp.float32)
    zeros3 = jnp.zeros(3, jnp.float32)
    return PhysState(
        base_pos=jnp.array([0.0, 0.0, model.base_init_z], jnp.float32) + z * jnp.array([0, 0, 1.0], jnp.float32),
        base_quat=jnp.array([1.0, 0, 0, 0], jnp.float32),
        wheel_angle=zeros3,
        ball_pos=jnp.array([0.0, 0.0, model.ball_com_init_z], jnp.float32) + z * jnp.array([0, 0, 1.0], jnp.float32),
        ball_quat=jnp.array([1.0, 0, 0, 0], jnp.float32),
        base_vel=zeros3, base_angvel=zeros3, wheel_vel=zeros3,
        ball_vel=zeros3, ball_angvel=zeros3,
    )


class _Consts(NamedTuple):
    """Model constants as plain python/numpy scalars and tuples (fold into
    the trace as literals)."""
    m_tot: float
    inv_m_tot: float
    com_base: tuple
    s_b: tuple                   # body-frame COM moment m_b*com_b + m_w*sum(wcom)
    I_base: tuple                # M3 rows
    axis_b: tuple                # 3 x V3
    anchor_b: tuple
    wcom_b: tuple
    cap0_b: tuple                # capsule axis at theta=0
    capx_b: tuple                # axis x cap0 (Rodrigues partner)
    adc: tuple                   # axis . cap0 per wheel (~0)
    m_base: float
    m_wheel: float
    It: float
    dIa: float                   # I_axial - I_transverse
    Mtt: tuple                   # hinge-space inertia + armature per wheel
    inv_Mtt: tuple
    damping: float
    g: tuple
    m_ball: float
    inv_m_ball: float
    I_ball: float
    inv_I_ball: float
    ball_radius: float
    cap_radius: float
    cap_halflen: float
    body_spheres: tuple          # ((center V3, radius), ...) base-frame fall
                                 # contacts: tower ends + wheel bounding spheres


def _consts(model: BallbotModel) -> _Consts:
    t3 = lambda a: tuple(float(x) for x in np.asarray(a, np.float64))
    rows = lambda a: tuple(t3(r) for r in np.asarray(a, np.float64))
    com_b = np.asarray(model.com_base, np.float64)
    wcom = np.asarray(model.wheel_com, np.float64)
    axis = np.asarray(model.wheel_axis, np.float64)
    cap0 = np.asarray(model.wheel_cap_axis0, np.float64)
    m_b, m_w = float(model.m_base), float(model.m_wheel)
    It = float(model.I_wheel_transverse)
    Ia = float(model.I_wheel_axial)
    adc = tuple(float(np.dot(axis[k], cap0[k])) for k in range(3))
    Mtt = tuple(It + (Ia - It) * adc[k] ** 2 + float(model.armature)
                for k in range(3))
    m_tot = m_b + 3.0 * m_w
    return _Consts(
        m_tot=m_tot,
        inv_m_tot=1.0 / m_tot,
        com_base=t3(com_b),
        s_b=t3(m_b * com_b + m_w * wcom.sum(0)),
        I_base=rows(model.I_base),
        axis_b=rows(axis),
        anchor_b=rows(model.wheel_anchor),
        wcom_b=rows(wcom),
        cap0_b=rows(cap0),
        capx_b=rows(np.cross(axis, cap0)),
        adc=adc,
        m_base=m_b, m_wheel=m_w,
        It=It, dIa=Ia - It,
        Mtt=Mtt,
        inv_Mtt=tuple(1.0 / x for x in Mtt),
        damping=float(model.damping),
        g=t3(model.gravity),
        m_ball=float(model.m_ball),
        inv_m_ball=1.0 / float(model.m_ball),
        I_ball=float(model.I_ball),
        inv_I_ball=1.0 / float(model.I_ball),
        ball_radius=float(model.ball_radius),
        cap_radius=float(model.cap_radius),
        cap_halflen=float(model.cap_halflen),
        body_spheres=(
            # tower cylinder size 0.11 0.14 pos (0,0,0.2): inscribed spheres
            # at both axis ends (ballbot.xml:40)
            ((0.0, 0.0, 0.2 - 0.14 + 0.11), 0.11),
            ((0.0, 0.0, 0.2 + 0.14 - 0.11), 0.11),
            # one bounding sphere per wheel capsule at its (on-axis) COM
            *(((float(x[0]), float(x[1]), float(x[2])),
               float(np.hypot(model.cap_halflen, model.cap_radius)))
              for x in np.asarray(model.wheel_com, np.float64)),
        ),
    )


def _mdiag_add(m, s):
    return ((m[0][0] + s, m[0][1], m[0][2]),
            (m[1][0], m[1][1] + s, m[1][2]),
            (m[2][0], m[2][1], m[2][2] + s))


class _ScalarTerms(NamedTuple):
    R: tuple
    s_total: tuple
    s_hat: tuple       # 3 x V3 world hinge axes
    anchor_w: tuple
    wcom_w: tuple
    u_w: tuple         # 3 x V3 world capsule axes
    Mww: tuple         # M3
    Mwt: tuple         # 3 x V3 (hinge-angular coupling columns)
    bias_v: tuple
    bias_w: tuple
    bias_t: tuple      # 3 scalars
    tau_v: tuple
    tau_w: tuple
    tau_t: tuple


def _scalar_terms(c: _Consts, s: PhysState, ctrl) -> _ScalarTerms:
    q = (s.base_quat[..., 0], s.base_quat[..., 1],
         s.base_quat[..., 2], s.base_quat[..., 3])
    R = quat_to_m3(q)
    p = s3.unpack_v3(s.base_pos)
    w = s3.unpack_v3(s.base_angvel)
    thd = s3.unpack_v3(s.wheel_vel)
    ang = s3.unpack_v3(s.wheel_angle)

    r_b = mvec(R, c.com_base)
    s_total = mvec(R, c.s_b)

    # I_base in world: R I R^T (I const)
    T = s3.mmul(R, c.I_base)
    Ibw = s3.mmul(T, s3.mtranspose(R))

    s_hat, anchor_w, wcom_w, u_w, r_w = [], [], [], [], []
    for k in range(3):
        s_hat.append(mvec(R, c.axis_b[k]))
        anchor_w.append(vadd(p, mvec(R, c.anchor_b[k])))
        rw = mvec(R, c.wcom_b[k])
        r_w.append(rw)
        wcom_w.append(vadd(p, rw))
        ck, sk = jnp.cos(ang[k]), jnp.sin(ang[k])
        u_b = vadd(vscale(c.cap0_b[k], ck), vscale(c.capx_b[k], sk),
                   vscale(c.axis_b[k], c.adc[k] * (1.0 - ck)))
        u_w.append(mvec(R, u_b))

    # ---- mass matrix blocks ----
    # Mww = Ibw + m_b(|r_b|^2 I - r_b r_b^T)
    #     + sum_k [ It I + dIa u u^T + m_w(|r_w|^2 I - r_w r_w^T) ]
    Mww = _mdiag_add(Ibw, c.m_base * vnormsq(r_b) + 3.0 * c.It)
    Mww = s3.msub(Mww, s3.mscale(s3.mouter(r_b, r_b), c.m_base))
    for k in range(3):
        Mww = _mdiag_add(Mww, c.m_wheel * vnormsq(r_w[k]))
        Mww = s3.msub(Mww, s3.mscale(s3.mouter(r_w[k], r_w[k]), c.m_wheel))
        Mww = s3.madd(Mww, s3.mscale(s3.mouter(u_w[k], u_w[k]), c.dIa))
    # Mwt_k = I_wheel_w s_hat = It s_hat + dIa u (u.s_hat); u.s_hat = adc const
    Mwt = tuple(vadd(vscale(s_hat[k], c.It), vscale(u_w[k], c.dIa * c.adc[k]))
                for k in range(3))

    # ---- bias (Newton-Euler at u_dot = 0) ----
    def Iw_apply(k, x):
        return vadd(vscale(x, c.It), vscale(u_w[k], c.dIa * vdot(u_w[k], x)))

    F0_b = vscale(vcross(w, vcross(w, r_b)), c.m_base)
    N0_b = vcross(w, mvec(Ibw, w))
    bias_v = F0_b
    bias_w = vadd(vcross(r_b, F0_b), N0_b)
    bias_t = []
    for k in range(3):
        omega_k = vadd(w, vscale(s_hat[k], thd[k]))
        F0_w = vscale(vcross(w, vcross(w, r_w[k])), c.m_wheel)
        wdot0 = vscale(vcross(w, s_hat[k]), thd[k])
        N0_w = vadd(Iw_apply(k, wdot0),
                    vcross(omega_k, Iw_apply(k, omega_k)))
        bias_v = vadd(bias_v, F0_w)
        bias_w = vadd(bias_w, vcross(r_w[k], F0_w), N0_w)
        bias_t.append(vdot(s_hat[k], N0_w))

    # ---- external generalized forces: gravity + motors + joint damping ----
    ctrl_t = (ctrl[..., 0], ctrl[..., 1], ctrl[..., 2])
    tau_v = vscale(c.g, c.m_tot)
    tau_w = vcross(s_total, c.g)
    tau_t = tuple(ctrl_t[k] - c.damping * thd[k] for k in range(3))

    return _ScalarTerms(R=R, s_total=s_total, s_hat=tuple(s_hat),
                        anchor_w=tuple(anchor_w), wcom_w=tuple(wcom_w),
                        u_w=tuple(u_w), Mww=Mww, Mwt=Mwt,
                        bias_v=bias_v, bias_w=bias_w, bias_t=tuple(bias_t),
                        tau_v=tau_v, tau_w=tau_w, tau_t=tau_t)


def _make_solver(c: _Consts, t: _ScalarTerms):
    """Closed-form M^-1 application via block elimination (see module doc).

    Returns solve(r1, r2, r3) -> (v, w, thd) with r1, r2 V3 and r3 a 3-tuple.
    """
    s = t.s_total
    # Schur complement S3 = Mww - (|s|^2 I - s s^T)/a - sum Mwt Mwt^T / Mtt
    S = _mdiag_add(t.Mww, -vnormsq(s) * c.inv_m_tot)
    S = s3.madd(S, s3.mscale(s3.mouter(s, s), c.inv_m_tot))
    for k in range(3):
        S = s3.msub(S, s3.mscale(s3.mouter(t.Mwt[k], t.Mwt[k]), c.inv_Mtt[k]))
    Sinv = sym3_inv(S)

    def solve(r1, r2, r3):
        t2 = vsub(r2, vscale(vcross(s, r1), c.inv_m_tot))
        for k in range(3):
            t2 = vsub(t2, vscale(t.Mwt[k], r3[k] * c.inv_Mtt[k]))
        w = mvec(Sinv, t2)
        thd = tuple((r3[k] - vdot(t.Mwt[k], w)) * c.inv_Mtt[k]
                    for k in range(3))
        v = vscale(vadd(r1, vcross(s, w)), c.inv_m_tot)
        return v, w, thd

    return solve


def _tangent_frame(n):
    """Orthonormal tangents for normal n (n never parallel to x here: n_z > 0)."""
    t1 = vsub((1.0, 0.0, 0.0), vscale(n, n[0]))
    inv = 1.0 / jnp.maximum(s3.vnorm(t1), 1e-8)
    t1 = vscale(t1, inv)
    return t1, vcross(n, t1)


def _as_sampler(model, terrain, zscale):
    """Accept either an (n, n) height grid or a prebuilt point-sampler
    callable (see hfield.make_sampler — the fast path for terrain banks)."""
    if callable(terrain):
        return terrain
    return hf.make_sampler(terrain, None, model.hfield_half_extent, zscale)


def _query_points(c: _Consts, s: PhysState):
    """The 6 terrain query points (xy) for the static contact set: ball +
    5 body spheres. Stacked so ONE sampler call covers them all."""
    q = (s.base_quat[..., 0], s.base_quat[..., 1],
         s.base_quat[..., 2], s.base_quat[..., 3])
    R = quat_to_m3(q)
    p = s3.unpack_v3(s.base_pos)
    xs = [s.ball_pos[..., 0]]
    ys = [s.ball_pos[..., 1]]
    for center_b, _ in c.body_spheres:
        cw = vadd(p, mvec(R, center_b))
        xs.append(cw[0])
        ys.append(cw[1])
    return jnp.stack(xs, axis=-1), jnp.stack(ys, axis=-1)


def _sample_planes(c: _Consts, sampler, s: PhysState):
    """Sample the heightfield ONCE per control step at the 6 contact query
    points (one vectorized gather instead of 6 points x 4 RK4 stages of
    separate taps — the difference between 0.75M and multi-M env steps/s on
    TPU) and return first-order local planes h(x, y) ~ h0 + gx dx + gy dy.

    Conscious approximation: contact points move <~2 mm within one 2 ms step,
    far below the 3.4 cm terrain cell, so per-stage re-evaluation of the
    bilinear surface changes forces negligibly (goldens regenerated when this
    landed)."""
    qx, qy = _query_points(c, s)
    h, gx, gy = sampler(qx, qy)
    planes = []
    for i in range(6):
        planes.append((qx[..., i], qy[..., i], h[..., i],
                       gx[..., i], gy[..., i]))
    return tuple(planes)


def _plane_at(plane, x, y):
    """Evaluate a local terrain plane: (h, gx, gy) at (x, y)."""
    x0, y0, h0, gx, gy = plane
    return h0 + gx * (x - x0) + gy * (y - y0), gx, gy


def _forward_scalar(c: _Consts, cp: ContactParams, planes, s: PhysState,
                    ctrl_torque):
    """Scalarized forward dynamics. Returns ((v̇, ẇ, θ̈), a_ball, α_ball)
    as scalar tuples. `planes` = per-contact-point local terrain planes
    from _sample_planes (no memory traffic inside the RK4 stages)."""
    t = _scalar_terms(c, s, ctrl_torque)
    solve = _make_solver(c, t)

    p = s3.unpack_v3(s.base_pos)
    bp = s3.unpack_v3(s.ball_pos)
    v = s3.unpack_v3(s.base_vel)
    w = s3.unpack_v3(s.base_angvel)
    thd = s3.unpack_v3(s.wheel_vel)
    bv = s3.unpack_v3(s.ball_vel)
    bw = s3.unpack_v3(s.ball_angvel)

    kp, kd, slope = cp.kp, cp.kd, cp.friction_slope
    zero3 = (0.0, 0.0, 0.0)

    # accumulators: robot generalized force J_r^T f, ball wrench J_b^T f
    acc_v, acc_w = s3.vzero(), s3.vzero()
    acc_t = [jnp.float32(0.0)] * 3
    ball_f, ball_tq = s3.vzero(), s3.vzero()

    def contact_rows(depth, dirs, mus, jr_of, jb_arm):
        """Process one contact: dirs = (n, t1, t2); jr_of(d) -> (jv, jw, jt)
        robot-side Jacobian row or None; jb_arm = xc - bp (ball-side arm).
        Returns (f, rows) where rows[i] = (d, jr, varm) for accumulation."""
        active = depth > 0.0
        out = []
        f_vals = []
        for i, d in enumerate(dirs):
            varm = vcross(jb_arm, d)
            v_row = vdot(d, bv) + vdot(varm, bw)
            d_b = c.inv_m_ball + vnormsq(varm) * c.inv_I_ball
            jr = jr_of(d) if jr_of is not None else None
            if jr is not None:
                jv, jw_, jt = jr
                sv, sw, st = solve(jv, jw_, jt)
                d_r = vdot(jv, sv) + vdot(jw_, sw) + sum(
                    jt[k] * st[k] for k in range(3))
                v_row = v_row + vdot(jv, v) + vdot(jw_, w) + sum(
                    jt[k] * thd[k] for k in range(3))
            else:
                d_r = 0.0
            m_eff = 1.0 / (d_r + d_b + 1e-10)
            if i == 0:
                f = jnp.maximum(m_eff * (kp * depth - kd * v_row), 0.0)
                f = jnp.where(active, f, 0.0)
                f_n = f
            else:
                lim = mus[i - 1] * f_n
                f = jnp.clip(jnp.where(active, -m_eff * slope * v_row, 0.0),
                             -lim, lim)
            f_vals.append(f)
            out.append((d, jr, varm))
        return f_vals, out

    # ---- contact 0: ball <-> terrain ----
    h, dhx, dhy = _plane_at(planes[0], bp[0], bp[1])
    inv_n = 1.0 / jnp.sqrt(1.0 + dhx * dhx + dhy * dhy)
    n0 = (-dhx * inv_n, -dhy * inv_n, inv_n)
    gap = (bp[2] - h) * n0[2]
    depth0 = c.ball_radius - gap
    t1_0, t2_0 = _tangent_frame(n0)
    arm0 = vscale(n0, -c.ball_radius)          # xc - bp
    f0, rows0 = contact_rows(depth0, (n0, t1_0, t2_0),
                             (cp.mu_terrain, cp.mu_terrain), None, arm0)
    for f, (d, _, varm) in zip(f0, rows0):
        ball_f = vadd(ball_f, vscale(d, f))
        ball_tq = vadd(ball_tq, vscale(varm, f))

    # ---- contacts 1..3: wheel capsule <-> ball ----
    for k in range(3):
        u = t.u_w[k]
        wc = t.wcom_w[k]
        dvec = vsub(bp, wc)
        tproj = jnp.clip(vdot(dvec, u), -c.cap_halflen, c.cap_halflen)
        cpnt = vadd(wc, vscale(u, tproj))
        delta = vsub(bp, cpnt)
        dist = s3.vnorm(delta)
        n = vscale(delta, 1.0 / jnp.maximum(dist, 1e-9))
        depth = (c.ball_radius + c.cap_radius) - dist
        xc = vadd(cpnt, vscale(n, c.cap_radius - 0.5 * depth))
        # patched frame: tangent1 = capsule axis projected to tangent plane
        t1 = vsub(u, vscale(n, vdot(u, n)))
        t1 = vscale(t1, 1.0 / jnp.maximum(s3.vnorm(t1), 1e-8))
        t2 = vcross(n, t1)
        arm_r = vsub(xc, p)
        arm_hinge = vsub(xc, t.anchor_w[k])
        jt_coef = vcross(t.s_hat[k], arm_hinge)

        def jr_of(d, arm_r=arm_r, jt_coef=jt_coef, k=k):
            jv = vscale(d, -1.0)
            jw_ = vscale(vcross(arm_r, d), -1.0)
            jt = [0.0, 0.0, 0.0]
            jt[k] = -vdot(jt_coef, d)
            return jv, jw_, tuple(jt)

        fk, rowsk = contact_rows(depth, (n, t1, t2),
                                 (cp.mu_wheel_axis, cp.mu_wheel_perp),
                                 jr_of, vsub(xc, bp))
        for f, (d, jr, varm) in zip(fk, rowsk):
            jv, jw_, jt = jr
            acc_v = vadd(acc_v, vscale(jv, f))
            acc_w = vadd(acc_w, vscale(jw_, f))
            acc_t[k] = acc_t[k] + jt[k] * f
            ball_f = vadd(ball_f, vscale(d, f))
            ball_tq = vadd(ball_tq, vscale(varm, f))

    # ---- contacts 4..8: robot body spheres <-> terrain (fall cases) ----
    for sphere_i, (center_b, radius) in enumerate(c.body_spheres):
        cw = vadd(p, mvec(t.R, center_b))
        h_s, dhx_s, dhy_s = _plane_at(planes[1 + sphere_i], cw[0], cw[1])
        inv_ns = 1.0 / jnp.sqrt(1.0 + dhx_s * dhx_s + dhy_s * dhy_s)
        ns = (-dhx_s * inv_ns, -dhy_s * inv_ns, inv_ns)
        depth_s = radius - (cw[2] - h_s) * ns[2]
        active_s = depth_s > 0.0
        xc_s = vsub(cw, vscale(ns, radius))
        arm_s = vsub(xc_s, p)
        t1_s, t2_s = _tangent_frame(ns)
        f_n_s = None
        for i, d in enumerate((ns, t1_s, t2_s)):
            jv = d
            jw_ = vcross(arm_s, d)
            sv, sw, st = solve(jv, jw_, zero3)
            d_r = vdot(jv, sv) + vdot(jw_, sw)
            v_row = vdot(jv, v) + vdot(jw_, w)
            m_eff = 1.0 / (d_r + 1e-10)
            if i == 0:
                f = jnp.maximum(m_eff * (kp * depth_s - kd * v_row), 0.0)
                f = jnp.where(active_s, f, 0.0)
                f_n_s = f
            else:
                lim = cp.mu_terrain * f_n_s
                f = jnp.clip(jnp.where(active_s, -m_eff * slope * v_row, 0.0),
                             -lim, lim)
            acc_v = vadd(acc_v, vscale(jv, f))
            acc_w = vadd(acc_w, vscale(jw_, f))

    # ---- accelerations ----
    r1 = vadd(t.tau_v, vscale(t.bias_v, -1.0), acc_v)
    r2 = vadd(t.tau_w, vscale(t.bias_w, -1.0), acc_w)
    r3 = tuple(t.tau_t[k] - t.bias_t[k] + acc_t[k] for k in range(3))
    vdot_, wdot_, thdd = solve(r1, r2, r3)

    a_ball = vadd(vscale(ball_f, c.inv_m_ball), c.g)
    alpha_ball = vscale(ball_tq, c.inv_I_ball)
    return (vdot_, wdot_, thdd), a_ball, alpha_ball


def forward(model: BallbotModel, cp: ContactParams, terrain, zscale,
            s: PhysState, ctrl_torque):
    """Forward dynamics: accelerations of all 15 DoF under contact forces.

    `terrain` may be an (n, n) grid or a point-sampler callable (zscale is
    then ignored). Returns (udot_r (9,), a_ball (3,), alpha_ball (3,))."""
    sampler = _as_sampler(model, terrain, zscale)
    c = _consts(model)
    planes = _sample_planes(c, sampler, s)
    (vd, wd, thdd), a_ball, alpha_ball = _forward_scalar(
        c, cp, planes, s, ctrl_torque)
    udot_r = jnp.concatenate([s3.pack_v3(vd), s3.pack_v3(wd),
                              s3.pack_v3(thdd)], axis=-1)
    return udot_r, s3.pack_v3(a_ball), s3.pack_v3(alpha_ball)


# ---------------------------------------------------------------------------
# Dense assembly — dev-time validation against the MuJoCo oracle only
# (tools/validate_physics.py); not on the hot path.
# ---------------------------------------------------------------------------

class _Terms(NamedTuple):
    M: jnp.ndarray        # (9,9)
    bias: jnp.ndarray     # (9,)  (Coriolis+gyroscopic, LHS)
    tau_ext: jnp.ndarray  # (9,)  gravity + motors + damping
    R: jnp.ndarray        # base rotation
    s_hat: jnp.ndarray    # (3,3) world hinge axes (rows)
    anchor_w: jnp.ndarray  # (3,3)
    wcom_w: jnp.ndarray   # (3,3)
    cap_axis_w: jnp.ndarray  # (3,3)


def _rigid_terms(model: BallbotModel, s: PhysState, ctrl_torque) -> _Terms:
    """Assemble the dense 9x9 mass matrix / bias from the scalar blocks."""
    c = _consts(model)
    t = _scalar_terms(c, s, ctrl_torque)
    sk = s3.pack_v3(t.s_total)
    # Svw = -skew(s_total)
    Svw = jnp.stack([
        s3.pack_v3((0.0 * sk[..., 0], sk[..., 2], -sk[..., 1])),
        s3.pack_v3((-sk[..., 2], 0.0 * sk[..., 0], sk[..., 0])),
        s3.pack_v3((sk[..., 1], -sk[..., 0], 0.0 * sk[..., 0])),
    ], axis=-2)
    Mww = s3.pack_m3(t.Mww)
    Mwt = jnp.stack([s3.pack_v3(t.Mwt[k]) for k in range(3)], axis=-2)
    dt_ = Mww.dtype
    M = jnp.zeros(Mww.shape[:-2] + (9, 9), dt_)
    M = M.at[..., 0:3, 0:3].set(c.m_tot * jnp.eye(3, dtype=dt_))
    M = M.at[..., 0:3, 3:6].set(Svw.astype(dt_))
    M = M.at[..., 3:6, 0:3].set(jnp.swapaxes(Svw, -1, -2).astype(dt_))
    M = M.at[..., 3:6, 3:6].set(Mww)
    M = M.at[..., 3:6, 6:9].set(jnp.swapaxes(Mwt, -1, -2))
    M = M.at[..., 6:9, 3:6].set(Mwt)
    M = M.at[..., 6:9, 6:9].set(jnp.diag(jnp.asarray(c.Mtt, dt_)))
    bias = jnp.concatenate([s3.pack_v3(t.bias_v), s3.pack_v3(t.bias_w),
                            s3.pack_v3(t.bias_t)], axis=-1)
    tau = jnp.concatenate([s3.pack_v3(t.tau_v), s3.pack_v3(t.tau_w),
                           s3.pack_v3(t.tau_t)], axis=-1)
    return _Terms(M=M, bias=bias, tau_ext=tau, R=s3.pack_m3(t.R),
                  s_hat=jnp.stack([s3.pack_v3(x) for x in t.s_hat], axis=-2),
                  anchor_w=jnp.stack([s3.pack_v3(x) for x in t.anchor_w], axis=-2),
                  wcom_w=jnp.stack([s3.pack_v3(x) for x in t.wcom_w], axis=-2),
                  cap_axis_w=jnp.stack([s3.pack_v3(x) for x in t.u_w], axis=-2))


# ---------------------------------------------------------------------------
# Integration
# ---------------------------------------------------------------------------

def _deriv(model, c, cp, planes, s: PhysState, ctrl_torque):
    (vd, wd, thdd), a_ball, alpha_ball = _forward_scalar(
        c, cp, planes, s, ctrl_torque)
    return PhysState(
        base_pos=s.base_vel,
        base_quat=quat_deriv(s.base_quat, s.base_angvel),
        wheel_angle=s.wheel_vel,
        ball_pos=s.ball_vel,
        ball_quat=quat_deriv(s.ball_quat, s.ball_angvel),
        base_vel=s3.pack_v3(vd),
        base_angvel=s3.pack_v3(wd),
        wheel_vel=s3.pack_v3(thdd),
        ball_vel=s3.pack_v3(a_ball),
        ball_angvel=s3.pack_v3(alpha_ball),
    )


def _axpy(s: PhysState, ds: PhysState, h: float) -> PhysState:
    return jax.tree.map(lambda a, b: a + h * b, s, ds)


def step(model: BallbotModel, cp: ContactParams, terrain, zscale,
         s: PhysState, ctrl_torque) -> PhysState:
    """One RK4 physics step of model.dt (= 2 ms, 500 Hz).

    `terrain` may be an (n, n) grid or a point-sampler callable."""
    sampler = _as_sampler(model, terrain, zscale)
    c = _consts(model)
    planes = _sample_planes(c, sampler, s)   # one fused gather per step
    dt = model.dt
    k1 = _deriv(model, c, cp, planes, s, ctrl_torque)
    k2 = _deriv(model, c, cp, planes, _axpy(s, k1, dt / 2), ctrl_torque)
    k3 = _deriv(model, c, cp, planes, _axpy(s, k2, dt / 2), ctrl_torque)
    k4 = _deriv(model, c, cp, planes, _axpy(s, k3, dt), ctrl_torque)
    new = jax.tree.map(
        lambda y, a, b, c_, d: y + (dt / 6.0) * (a + 2 * b + 2 * c_ + d),
        s, k1, k2, k3, k4)
    return new.replace(
        base_quat=quat_normalize(new.base_quat),
        ball_quat=quat_normalize(new.ball_quat),
    )
