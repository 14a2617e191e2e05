"""Derive exact rigid-body constants for the ballbot model using MuJoCo (dev-time only).

The runtime framework (openballbot_rl_tpu.physics) is pure JAX and consumes a
frozen table of constants (masses, inertias, body-frame geometry). Rather than
hand-integrating densities over the primitive geoms, this tool builds the
physically-equivalent model programmatically with mujoco.MjSpec — mirroring the
spec of the reference robot (see /root/reference/ballbot_gym/models/ballbot.xml,
cited per-field below) — compiles it, and dumps the mass properties that
MuJoCo's compiler computes. The output is written to
openballbot_rl_tpu/physics/_generated_constants.py.

The reference's cone-mesh marker geoms (ballbot.xml:45,51) are omitted: the STL
is absent from the reference snapshot and at scale 0.01 with density 1.0 its
mass is O(1e-6 kg) — negligible. The camera capsule "sticks" (ballbot.xml:46,52)
ARE included (≈0.067 kg each at a 0.17 m lever arm).

Run:  python tools/derive_constants.py
"""
from __future__ import annotations

import json
import sys

import mujoco
import numpy as np

HFIELD_N = 293          # ballbot.xml:23  nrow=ncol=293
HFIELD_XY = 5.0         # ballbot.xml:23  size "5 5 2.0 0.1" -> half-extent 5 m
HFIELD_ZSCALE = 2.0     # vertical scale (m)
HFIELD_ZBASE = 0.1      # base (below-zero) thickness


def build_spec() -> mujoco.MjSpec:
    spec = mujoco.MjSpec()
    spec.option.timestep = 0.002                      # ballbot.xml:3
    spec.option.cone = mujoco.mjtCone.mjCONE_ELLIPTIC  # ballbot.xml:4
    spec.option.integrator = mujoco.mjtIntegrator.mjINT_RK4  # ballbot.xml:5

    # Heightfield terrain asset + geom (ballbot.xml:23,35)
    hf = spec.add_hfield()
    hf.name = "terrain"
    hf.nrow = HFIELD_N
    hf.ncol = HFIELD_N
    hf.size = [HFIELD_XY, HFIELD_XY, HFIELD_ZSCALE, HFIELD_ZBASE]
    hf.userdata = np.zeros(HFIELD_N * HFIELD_N)
    g = spec.worldbody.add_geom()
    g.name = "terrain"
    g.type = mujoco.mjtGeom.mjGEOM_HFIELD
    g.hfieldname = "terrain"

    # --- base body (ballbot.xml:38) ---
    base = spec.worldbody.add_body(name="base", pos=[0, 0, 0.24])
    base.add_freejoint()

    tower = base.add_geom()
    tower.name = "tower_collision"                    # ballbot.xml:41
    tower.type = mujoco.mjtGeom.mjGEOM_CYLINDER
    tower.size = [0.11, 0.14, 0]
    tower.pos = [0, 0, 0.2]
    tower.density = 23.6

    ballast = base.add_geom()
    ballast.name = "ballast"                          # ballbot.xml:42
    ballast.type = mujoco.mjtGeom.mjGEOM_BOX
    ballast.size = [0.1, 0.1, 0.1]
    ballast.pos = [0, 0, 0.002]
    ballast.density = 400.0
    ballast.contype = 0
    ballast.conaffinity = 0

    # camera bodies with stick capsules (ballbot.xml:44-54); cone meshes omitted
    for i, (bpos, beuler, sto) in enumerate([
        ([0.17, -0.01, -0.06], [180, -30, 0], [-0.2, 0, 0]),
        ([-0.17, -0.01, -0.06], [180, 30, 0], [0.2, 0, 0]),
    ]):
        cam = base.add_body(name=f"cam_{i}_body", pos=bpos)
        cam.alt.type = mujoco.mjtOrientation.mjORIENTATION_EULER
        cam.alt.euler = beuler
        stick = cam.add_geom()
        stick.name = f"cam_{i}_stick"
        stick.type = mujoco.mjtGeom.mjGEOM_CAPSULE
        stick.size = [0.01, 0, 0]
        stick.fromto = [0, 0, 0] + sto
        c = cam.add_camera()
        c.name = f"cam_{i}"
        c.alt.type = mujoco.mjtOrientation.mjORIENTATION_EULER
        c.alt.euler = [180, 0, 0]
        c.fovy = 90

    # wheels (ballbot.xml:56-70)
    wheel_axis = [-0.15316554764123935, -0.6903189805903613, -0.7071067953657663]
    for i in range(3):
        w = base.add_body(name=f"wheel_{i}", pos=[0, 0, -0.001])
        w.alt.type = mujoco.mjtOrientation.mjORIENTATION_EULER
        w.alt.euler = [0, 0, 120 * i]
        wg = w.add_geom()
        wg.name = f"wheel_mesh_{i}"
        wg.type = mujoco.mjtGeom.mjGEOM_CAPSULE
        wg.size = [0.025, 0.02, 0]
        wg.alt.type = mujoco.mjtOrientation.mjORIENTATION_EULER
        wg.alt.euler = [-45, 9, 0]
        wg.pos = [-0.018, -0.08, -0.053]
        wg.density = 620.0
        wj = w.add_joint()
        wj.name = f"wheel_joint_{i}"
        wj.type = mujoco.mjtJoint.mjJNT_HINGE
        wj.axis = wheel_axis
        wj.pos = [0, 0, 0.0293]
        wj.armature = 0.005
        wj.damping[0] = 0.8

    base.add_site(name="imu_site", pos=[0, 0, 0])

    # --- ball (ballbot.xml:76-79) ---
    ball = spec.worldbody.add_body(name="ball", pos=[0, 0, 0.26])
    ball.add_freejoint()
    bg = ball.add_geom()
    bg.name = "the_ball"
    bg.type = mujoco.mjtGeom.mjGEOM_SPHERE
    bg.size = [0.09, 0, 0]
    bg.pos = [0, 0, -0.14]
    bg.density = 55.0

    # actuators (ballbot.xml:82-87)
    for i in range(3):
        a = spec.add_actuator()
        a.name = f"motor_{i}"
        a.target = f"wheel_joint_{i}"
        a.trntype = mujoco.mjtTrn.mjTRN_JOINT
        a.gainprm[0] = 1.0
        a.ctrlrange = [-10, 10]
        a.ctrllimited = True

    # contact pairs ball<->wheel with anisotropic friction (ballbot.xml:89-93)
    for i in range(3):
        p = spec.add_pair()
        p.geomname1 = "the_ball"
        p.geomname2 = f"wheel_mesh_{i}"
        p.condim = 3
        p.friction[0] = 0.001
        p.friction[1] = 1.0

    return spec


def fuse_rigid_group(model, data, body_ids):
    """Fuse several welded bodies into one rigid body (mass, com, inertia about com, world->base frame).

    Assumes data is at qpos0 with identity base orientation; returns quantities in
    the base body frame.
    """
    mujoco.mj_forward(model, data)
    base_id = body_ids[0]
    R_base = data.xmat[base_id].reshape(3, 3)
    p_base = data.xpos[base_id]

    m_tot = 0.0
    com = np.zeros(3)
    for b in body_ids:
        m = model.body_mass[b]
        ipos_w = data.xipos[b]          # world com of body b
        m_tot += m
        com += m * ipos_w
    com /= m_tot

    I_tot = np.zeros((3, 3))
    for b in body_ids:
        m = model.body_mass[b]
        ipos_w = data.xipos[b]
        R_i = data.ximat[b].reshape(3, 3)   # world rotation of inertia frame
        I_local = np.diag(model.body_inertia[b])
        I_w = R_i @ I_local @ R_i.T
        r = ipos_w - com
        I_tot += I_w + m * ((r @ r) * np.eye(3) - np.outer(r, r))

    # express in base frame
    com_b = R_base.T @ (com - p_base)
    I_b = R_base.T @ I_tot @ R_base
    return m_tot, com_b, I_b


def main():
    spec = build_spec()
    model = spec.compile()
    data = mujoco.MjData(model)
    mujoco.mj_forward(model, data)

    name2id = lambda t, n: mujoco.mj_name2id(model, t, n)
    B = mujoco.mjtObj.mjOBJ_BODY
    G = mujoco.mjtObj.mjOBJ_GEOM

    base_id = name2id(B, "base")
    cam_ids = [name2id(B, "cam_0_body"), name2id(B, "cam_1_body")]
    wheel_ids = [name2id(B, f"wheel_{i}") for i in range(3)]
    ball_id = name2id(B, "ball")

    # Fused base assembly = base + cam bodies (welded; wheels & ball excluded)
    m_base, com_base, I_base = fuse_rigid_group(model, data, [base_id] + cam_ids)

    out = {
        "timestep": model.opt.timestep,
        "gravity": list(model.opt.gravity),
        "hfield": {"n": HFIELD_N, "half_extent": HFIELD_XY,
                   "zscale": HFIELD_ZSCALE, "zbase": HFIELD_ZBASE},
        "base": {
            "init_pos": [0.0, 0.0, 0.24],
            "mass": float(m_base),
            "com": com_base.tolist(),          # in base frame
            "inertia_com": I_base.tolist(),    # about com, base frame (identity orientation)
        },
        "wheels": [],
        "ball": {},
    }

    R_base = data.xmat[base_id].reshape(3, 3)
    p_base = data.xpos[base_id]
    to_base = lambda pw: (R_base.T @ (pw - p_base)).tolist()
    dir_to_base = lambda dw: (R_base.T @ dw).tolist()

    for i, wid in enumerate(wheel_ids):
        gid = name2id(G, f"wheel_mesh_{i}")
        jid = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_JOINT, f"wheel_joint_{i}")
        R_w = data.xmat[wid].reshape(3, 3)
        # capsule principal axis = local z of geom frame
        R_g = data.geom_xmat[gid].reshape(3, 3)
        cap_axis_w = R_g[:, 2]
        cap_center_w = data.geom_xpos[gid]
        # hinge anchor/axis in world (at qpos0)
        anchor_w = data.xanchor[jid]
        axis_w = data.xaxis[jid]
        I_local = np.diag(model.body_inertia[wid])
        # capsule inertia is axisymmetric: I = It*I + (Ia - It) u u^T.
        # MuJoCo stores principal inertia; identify the distinct (axial) value.
        vals = model.body_inertia[wid]
        # find the value that differs from the other two
        pairs = [(0, 1, 2), (1, 2, 0), (2, 0, 1)]
        Ia, It = None, None
        for a, b, c in pairs:
            if abs(vals[a] - vals[b]) < 1e-12:
                It, Ia = vals[a], vals[c]
                break
        out["wheels"].append({
            "mass": float(model.body_mass[wid]),
            "com": to_base(data.xipos[wid]),
            "cap_center": to_base(cap_center_w),
            "cap_axis0": dir_to_base(cap_axis_w),   # capsule axis at theta=0, base frame
            "cap_radius": 0.025,
            "cap_halflen": 0.02,
            "hinge_anchor": to_base(anchor_w),
            "hinge_axis": dir_to_base(axis_w / np.linalg.norm(axis_w)),
            "I_axial": float(Ia),
            "I_transverse": float(It),
            "armature": 0.005,
            "damping": 0.8,
        })

    bgid = name2id(G, "the_ball")
    out["ball"] = {
        "init_pos": [0.0, 0.0, 0.26],
        "mass": float(model.body_mass[ball_id]),
        "com_offset": [0.0, 0.0, -0.14],  # geom pos in ball body frame (ballbot.xml:78)
        "radius": 0.09,
        "inertia": float(model.body_inertia[ball_id][0]),  # isotropic sphere
    }

    # Sanity print of full-model mass/dof info
    out["nq"] = model.nq
    out["nv"] = model.nv
    out["total_mass"] = float(sum(model.body_mass))

    js = json.dumps(out, indent=2)
    header = (
        '"""AUTO-GENERATED by tools/derive_constants.py — do not edit.\n\n'
        "Rigid-body constants for the ballbot mechanism, derived by compiling the\n"
        "physically-equivalent MjSpec model (densities/geometry per the reference\n"
        "robot spec, ballbot_gym/models/ballbot.xml) and reading MuJoCo's computed\n"
        'mass properties. Runtime physics is pure JAX; MuJoCo is dev-time only.\n"""\n'
        f"CONSTANTS = {js}\n"
    )
    path = "openballbot_rl_tpu/physics/_generated_constants.py"
    with open(path, "w") as f:
        f.write(header)
    print(js)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    sys.exit(main())
