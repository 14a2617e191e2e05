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

    M = [[ m I3      -[s]x     0      ]
         [ [s]x       Mww      Iw s_i ]
         [ 0        (Iw s_i)^T  s^T Iw s + armature ]]

assembled in closed form each stage (generalized coords u = [v_world, w_world,
theta_dot]). Bias (Coriolis/gyroscopic) forces come from projecting
Newton-Euler body forces at u_dot = 0 through the body Jacobians. The ball is
a separate free sphere with isotropic inertia (no gyroscopic term). Both are
validated against MuJoCo's mj_fullM / qfrc_bias in tests (dev-time oracle).

Contact model
-------------
MuJoCo-style soft constraints evaluated explicitly (per RK4 stage), with the
per-direction effective mass m_eff = 1/(J M^-1 J^T) (diagonal/decoupled
approximation of the Delassus operator):

    f_n = m_eff * (Kp * depth - Kd * v_n),  clamped >= 0
    f_t = -m_eff * Kf * v_t, clamped to the elliptic cone
          sqrt((f_t1/mu1)^2 + (f_t2/mu2)^2) <= f_n

with Kp = impedance / timeconst^2, Kd = Kf = 2*sqrt(impedance)/timeconst —
i.e. a critically damped constraint-space spring whose stiffness mirrors
MuJoCo's solref=(0.02, 1) / solimp amplification d/(1-d).

Contacts (static set, masked when inactive):
  0      ball <-> heightfield   (isotropic friction mu=1, condim 3)
  1..3   wheel_i capsule <-> ball, with the PATCHED contact frame: first
         tangent = capsule long axis (tools/mujoco_fix.patch:13-16), friction
         (0.001, 1.0) per ballbot.xml:90-92 — the omniwheel model: near-free
         sliding along the roller axis, full grip circumferentially.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from openballbot_rl_tpu.physics import hfield as hf
from openballbot_rl_tpu.physics.linalg import cho_solve_unrolled, cholesky_unrolled
from openballbot_rl_tpu.physics.model import BallbotModel
from openballbot_rl_tpu.physics.rotations import (
    axis_angle_rotate,
    quat_deriv,
    quat_normalize,
    quat_to_mat,
    skew,
)


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


class _Terms(NamedTuple):
    M: jnp.ndarray        # (9,9)
    bias: jnp.ndarray     # (9,)  (Coriolis+gyroscopic, LHS)
    tau_ext: jnp.ndarray  # (9,)  gravity + motors + damping
    R: jnp.ndarray        # base rotation
    s_hat: jnp.ndarray    # (3,3) world hinge axes
    anchor_w: jnp.ndarray  # (3,3)
    wcom_w: jnp.ndarray   # (3,3)
    cap_axis_w: jnp.ndarray  # (3,3)


def _rigid_terms(model: BallbotModel, s: PhysState, ctrl_torque) -> _Terms:
    R = quat_to_mat(s.base_quat)
    p, v, w = s.base_pos, s.base_vel, s.base_angvel
    thd = s.wheel_vel

    com_base = jnp.asarray(model.com_base, jnp.float32)
    I_base = jnp.asarray(model.I_base, jnp.float32)
    axes_b = jnp.asarray(model.wheel_axis, jnp.float32)       # (3,3) rows
    anchors_b = jnp.asarray(model.wheel_anchor, jnp.float32)
    wcoms_b = jnp.asarray(model.wheel_com, jnp.float32)
    cap0_b = jnp.asarray(model.wheel_cap_axis0, jnp.float32)

    s_hat = axes_b @ R.T                      # world hinge axes (rows)
    anchor_w = p + anchors_b @ R.T
    wcom_w = p + wcoms_b @ R.T
    cap_b = axis_angle_rotate(axes_b, s.wheel_angle, cap0_b)  # rotate in base frame
    cap_axis_w = cap_b @ R.T

    m_b, m_w = model.m_base, model.m_wheel
    It, Ia = model.I_wheel_transverse, model.I_wheel_axial

    I_base_w = R @ I_base @ R.T
    # wheel world inertia: It*I + (Ia-It) u u^T, per wheel -> (3,3,3)
    uuT = cap_axis_w[:, :, None] * cap_axis_w[:, None, :]
    I_wheel_w = It * jnp.eye(3, dtype=jnp.float32)[None] + (Ia - It) * uuT

    r_b = R @ com_base                        # base com rel p (world)
    r_w = wcom_w - p                          # (3,3)
    s_total = m_b * r_b + m_w * jnp.sum(r_w, axis=0)
    m_tot = m_b + 3.0 * m_w

    # --- mass matrix ---
    Svv = m_tot * jnp.eye(3, dtype=jnp.float32)
    Svw = -skew(s_total)
    sk_rb = skew(r_b)
    sk_rw = skew(r_w)                         # (3,3,3)
    Mww = (I_base_w - m_b * sk_rb @ sk_rb
           + jnp.sum(I_wheel_w - m_w * jnp.einsum('kij,kjl->kil', sk_rw, sk_rw), axis=0))
    Mwt = jnp.einsum('kij,kj->ki', I_wheel_w, s_hat)   # (3 wheels, 3) columns
    Mtt = jnp.einsum('ki,kij,kj->k', s_hat, I_wheel_w, s_hat) + model.armature

    M = jnp.zeros((9, 9), jnp.float32)
    M = M.at[0:3, 0:3].set(Svv)
    M = M.at[0:3, 3:6].set(Svw)
    M = M.at[3:6, 0:3].set(Svw.T)
    M = M.at[3:6, 3:6].set(Mww)
    M = M.at[3:6, 6:9].set(Mwt.T)
    M = M.at[6:9, 3:6].set(Mwt)
    M = M.at[6:9, 6:9].set(jnp.diag(Mtt))

    # --- bias (Newton-Euler at u_dot = 0) ---
    F0_b = m_b * jnp.cross(w, jnp.cross(w, r_b))
    N0_b = jnp.cross(w, I_base_w @ w)
    omega_k = w[None, :] + thd[:, None] * s_hat                 # (3,3)
    F0_w = m_w * jnp.cross(w, jnp.cross(w, r_w))
    wdot_k0 = thd[:, None] * jnp.cross(w, s_hat)
    Iw_omega = jnp.einsum('kij,kj->ki', I_wheel_w, omega_k)
    N0_w = jnp.einsum('kij,kj->ki', I_wheel_w, wdot_k0) + jnp.cross(omega_k, Iw_omega)

    bias_v = F0_b + jnp.sum(F0_w, axis=0)
    bias_w = (jnp.cross(r_b, F0_b) + N0_b
              + jnp.sum(jnp.cross(r_w, F0_w) + N0_w, axis=0))
    bias_t = jnp.einsum('ki,ki->k', s_hat, N0_w)
    bias = jnp.concatenate([bias_v, bias_w, bias_t])

    # --- external generalized forces: gravity + motors + joint damping ---
    g = jnp.asarray(model.gravity, jnp.float32)
    tau = jnp.concatenate([
        m_tot * g,
        jnp.cross(s_total, g),
        ctrl_torque - model.damping * thd,
    ])
    return _Terms(M, bias, tau, R, s_hat, anchor_w, wcom_w, cap_axis_w)


def _tangent_frame(n):
    """Orthonormal tangents for normal n (n never parallel to x here: n_z > 0)."""
    ref = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    t1 = ref - jnp.dot(ref, n) * n
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-8)
    t2 = jnp.cross(n, t1)
    return t1, t2


def _as_sampler(model, terrain, zscale):
    """Accept either an (n, n) height grid or a prebuilt point-sampler
    callable (see hfield.make_sampler — the fast path for terrain banks)."""
    if callable(terrain):
        return terrain
    return hf.make_sampler(terrain, None, model.hfield_half_extent, zscale)


def _contacts(model: BallbotModel, cp: ContactParams, sampler,
              s: PhysState, t: _Terms):
    """Build the static 4-contact set as stacked row data.

    Returns dict with J_r (12,9), J_b (12,6), depth (4,), dirs/mu metadata.
    Row layout per contact: [normal, tangent1, tangent2].
    """
    p = s.base_pos
    bp = s.ball_pos
    rows_r = []
    rows_b = []
    depths = []
    mus = []

    def point_jac_ball(d, xc):
        return jnp.concatenate([d, jnp.cross(xc - bp, d)])

    # --- contact 0: ball <-> terrain ---
    h, dhx, dhy = sampler(bp[0], bp[1])
    n0 = hf.surface_normal(dhx, dhy)
    gap = (bp[2] - h) * n0[2]          # approx distance from COM to surface
    depth0 = model.ball_radius - gap
    xc0 = bp - model.ball_radius * n0
    t1_0, t2_0 = _tangent_frame(n0)
    for d in (n0, t1_0, t2_0):
        rows_r.append(jnp.zeros(9, jnp.float32))
        rows_b.append(point_jac_ball(d, xc0))
    depths.append(depth0)
    mus.append((cp.mu_terrain, cp.mu_terrain))

    # --- contacts 1..3: wheel capsule <-> ball ---
    for i in range(3):
        u = t.cap_axis_w[i]
        wc = t.wcom_w[i]
        dvec = bp - wc
        tproj = jnp.clip(jnp.dot(dvec, u), -model.cap_halflen, model.cap_halflen)
        cpnt = wc + tproj * u
        delta = bp - cpnt
        dist = jnp.linalg.norm(delta)
        n = delta / jnp.maximum(dist, 1e-9)   # points toward ball (A = ball)
        depth = (model.ball_radius + model.cap_radius) - dist
        xc = cpnt + (model.cap_radius - 0.5 * depth) * n
        # patched frame: tangent1 = capsule axis (projected to tangent plane)
        t1 = u - jnp.dot(u, n) * n
        t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-8)
        t2 = jnp.cross(n, t1)
        for d in (n, t1, t2):
            # v_rel = v_ball_pt - v_wheel_pt ; robot rows get minus sign
            jr = jnp.concatenate([
                -d,
                -jnp.cross(xc - p, d),
                -(jnp.eye(3, dtype=jnp.float32)[i]
                  * jnp.dot(jnp.cross(t.s_hat[i], xc - t.anchor_w[i]), d)),
            ])
            rows_r.append(jr)
            rows_b.append(point_jac_ball(d, xc))
        depths.append(depth)
        mus.append((cp.mu_wheel_axis, cp.mu_wheel_perp))

    return (jnp.stack(rows_r), jnp.stack(rows_b),
            jnp.stack(depths), jnp.asarray(mus, jnp.float32))


def forward(model: BallbotModel, cp: ContactParams, terrain, zscale,
            s: PhysState, ctrl_torque):
    """Forward dynamics: accelerations of all 15 DoF under contact forces.

    `terrain` may be an (n, n) grid or a point-sampler callable (zscale is
    then ignored)."""
    sampler = _as_sampler(model, terrain, zscale)
    t = _rigid_terms(model, s, ctrl_torque)
    J_r, J_b, depth, mu = _contacts(model, cp, sampler, s, t)

    u_r = jnp.concatenate([s.base_vel, s.base_angvel, s.wheel_vel])
    u_b = jnp.concatenate([s.ball_vel, s.ball_angvel])

    L = cholesky_unrolled(t.M)
    Y = cho_solve_unrolled(L, J_r.T)                  # (9,12)
    d_r = jnp.einsum('ri,ir->r', J_r, Y)
    invMb = jnp.concatenate([
        jnp.full((3,), 1.0 / model.m_ball, jnp.float32),
        jnp.full((3,), 1.0 / model.I_ball, jnp.float32),
    ])
    d_b = jnp.einsum('ri,i,ri->r', J_b, invMb, J_b)
    m_eff = 1.0 / (d_r + d_b + 1e-10)

    v_rows = J_r @ u_r + J_b @ u_b                    # (12,)

    active = (depth > 0.0).astype(jnp.float32)        # (4,)
    kp, kd = cp.kp, cp.kd
    dep_r = jnp.repeat(depth, 3)
    act_r = jnp.repeat(active, 3)
    is_n = jnp.tile(jnp.array([1.0, 0.0, 0.0], jnp.float32), 4)

    f_normal = jnp.maximum(m_eff * (kp * dep_r - kd * v_rows), 0.0)
    f_tangent = -m_eff * cp.friction_slope * v_rows
    f = jnp.where(is_n > 0, f_normal, f_tangent) * act_r

    # Anisotropic friction cone clamp, per tangent axis (box cone).
    # A joint elliptic rescale (f *= fn/|f/mu|) is wrong under extreme
    # anisotropy: with mu1=0.001 a noise-level capsule-axis component
    # dominates the cone metric and crushes the drive-direction friction,
    # killing omniwheel authority. Independent clamping keeps |f_i| <= mu_i*fn
    # per axis — the intended roller behavior (free axial slide, full
    # circumferential grip); it overestimates combined-slip friction by at
    # most sqrt(2), comparable to MuJoCo's pyramidal cone option.
    f_c = f.reshape(4, 3)
    fn = f_c[:, 0]
    lim = mu * fn[:, None]
    f_c = f_c.at[:, 1:].set(jnp.clip(f_c[:, 1:], -lim, lim))
    f = f_c.reshape(12)

    tau_total = t.tau_ext - t.bias + J_r.T @ f
    udot_r = cho_solve_unrolled(L, tau_total)

    g = jnp.asarray(model.gravity, jnp.float32)
    wrench_b = J_b.T @ f
    a_ball = wrench_b[:3] / model.m_ball + g
    alpha_ball = wrench_b[3:] / model.I_ball

    return udot_r, a_ball, alpha_ball


def _deriv(model, cp, terrain, zscale, s: PhysState, ctrl_torque):
    udot_r, a_ball, alpha_ball = forward(model, cp, terrain, zscale, s, ctrl_torque)
    return PhysState(
        base_pos=s.base_vel,
        base_quat=quat_deriv(s.base_quat, s.base_angvel),
        wheel_angle=s.wheel_vel,
        ball_pos=s.ball_vel,
        ball_quat=quat_deriv(s.ball_quat, s.ball_angvel),
        base_vel=udot_r[0:3],
        base_angvel=udot_r[3:6],
        wheel_vel=udot_r[6:9],
        ball_vel=a_ball,
        ball_angvel=alpha_ball,
    )


def _axpy(s: PhysState, ds: PhysState, h: float) -> PhysState:
    return jax.tree.map(lambda a, b: a + h * b, s, ds)


def step(model: BallbotModel, cp: ContactParams, terrain, zscale,
         s: PhysState, ctrl_torque) -> PhysState:
    """One RK4 physics step of model.dt (= 2 ms, 500 Hz).

    `terrain` may be an (n, n) grid or a point-sampler callable."""
    terrain = _as_sampler(model, terrain, zscale)
    dt = model.dt
    k1 = _deriv(model, cp, terrain, zscale, s, ctrl_torque)
    k2 = _deriv(model, cp, terrain, zscale, _axpy(s, k1, dt / 2), ctrl_torque)
    k3 = _deriv(model, cp, terrain, zscale, _axpy(s, k2, dt / 2), ctrl_torque)
    k4 = _deriv(model, cp, terrain, zscale, _axpy(s, k3, dt), ctrl_torque)
    new = jax.tree.map(
        lambda y, a, b, c, d: y + (dt / 6.0) * (a + 2 * b + 2 * c + d),
        s, k1, k2, k3, k4)
    return new.replace(
        base_quat=quat_normalize(new.base_quat),
        ball_quat=quat_normalize(new.ball_quat),
    )
