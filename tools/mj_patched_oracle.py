"""Patched-MuJoCo oracle: reproduces tools/mujoco_fix.patch in Python.

The reference requires a MuJoCo source patch (mjraw_SphereCapsule writes the
capsule long axis into the contact frame's first tangent, making the
anisotropic pair friction (0.001, 1.0) act in a stable wheel-aligned frame —
tools/mujoco_fix.patch:13-16). We cannot rebuild MuJoCo here, but we can get
the identical effect by stepping the pipeline manually:

    mj_fwdPosition   (collision detection fills data.contact)
    <edit data.contact.frame for ball<->wheel contacts>
    mj_fwdVelocity / mj_fwdActuation / mj_fwdAcceleration / mj_fwdConstraint
    mj_Euler

This forfeits RK4 (mj_RungeKutta re-runs mj_forward internally, clobbering the
edit), so the oracle integrates with semi-implicit Euler at the same 500 Hz.
Good enough to validate controllers and to produce behavioral golden
trajectories for the JAX engine.
"""
from __future__ import annotations

import os
import sys

import mujoco
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.derive_constants import build_spec  # noqa: E402


class PatchedSim:
    def __init__(self, terrain: np.ndarray | None = None, zscale: float = 2.0):
        spec = build_spec()
        self.model = spec.compile()
        if zscale != 2.0:
            self.model.hfield_size[0, 2] = zscale
        if terrain is not None:
            self.model.hfield_data[:] = terrain.reshape(-1)
        self.data = mujoco.MjData(self.model)
        g = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_GEOM, "the_ball")
        self.ball_geom = g
        self.wheel_geoms = [
            mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_GEOM, f"wheel_mesh_{i}")
            for i in range(3)
        ]
        mujoco.mj_forward(self.model, self.data)

    def _patch_contact_frames(self):
        d = self.data
        for i in range(d.ncon):
            c = d.contact[i]
            g1, g2 = c.geom1, c.geom2
            for wi, wg in enumerate(self.wheel_geoms):
                if (g1 == self.ball_geom and g2 == wg) or (g2 == self.ball_geom and g1 == wg):
                    # capsule long axis in world = geom frame z axis
                    R = d.geom_xmat[wg].reshape(3, 3)
                    axis = R[:, 2]
                    frame = c.frame.reshape(3, 3)
                    n = frame[0]
                    # write axis into first tangent (mujoco_fix.patch:13-16
                    # copies the axis verbatim; re-orthogonalize the 3rd row)
                    t1 = axis
                    t2 = np.cross(n, t1)
                    nrm = np.linalg.norm(t2)
                    if nrm > 1e-9:
                        t2 /= nrm
                        frame[1] = t1
                        frame[2] = t2
                        c.frame[:] = frame.reshape(-1)

    def step(self, ctrl: np.ndarray):
        m, d = self.model, self.data
        d.ctrl[:] = ctrl
        mujoco.mj_fwdPosition(m, d)
        self._patch_contact_frames()
        mujoco.mj_fwdVelocity(m, d)
        mujoco.mj_fwdActuation(m, d)
        mujoco.mj_fwdAcceleration(m, d)
        mujoco.mj_fwdConstraint(m, d)
        mujoco.mj_Euler(m, d)
