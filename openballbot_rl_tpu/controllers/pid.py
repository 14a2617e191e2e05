"""Pitch/roll PID balance controller (pure JAX, scan-able).

Functional port of the reference's install sanity-check controller
(ballbot_gym/controllers/pid.py:6-102): extracts roll/pitch from the base
rotation matrix, runs PID in 2-D error space, and maps the 2-D command to the
three motors at 0/120/240 degrees (pid.py:95-100), clamped to +-10.

The controller's motor-space output is meant to be fed to the env `step`
exactly as the reference does in scripts/test_pid.py:46-54 (i.e. the env's
action scaling+clipping saturates it to the torque limit).
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PIDState:
    integral: jnp.ndarray  # (2,)
    prev_err: jnp.ndarray  # (2,)


@dataclasses.dataclass(frozen=True)
class PIDParams:
    """Gains.

    The reference ships k=(20, 15, 2) with finite-difference D
    (scripts/test_pid.py:32). Reproducing that controller faithfully —
    including in genuine MuJoCo 3.10, stock or with the contact-frame patch
    emulated — does NOT balance this plant (it depends on the behavior of the
    old pinned MuJoCo commit). This framework's balance sanity check therefore
    defaults to a properly tuned variant: stronger P and the D term taken from
    the gyro (base angular velocity) instead of differencing the error, which
    holds the JAX engine at <1 degree tilt indefinitely.
    """
    dt: float = 0.002
    k_p: float = 80.0
    k_i: float = 10.0
    k_d: float = 4.0


def reference_gains() -> "PIDParams":
    """The reference's original gains (scripts/test_pid.py:32), for parity
    experiments."""
    return PIDParams(k_p=20.0, k_i=15.0, k_d=2.0)


def pid_init() -> PIDState:
    return PIDState(integral=jnp.zeros(2, jnp.float32),
                    prev_err=jnp.zeros(2, jnp.float32))


def pid_act(params: PIDParams, state: PIDState, R: jnp.ndarray,
            omega_world: jnp.ndarray | None = None,
            setpoint_r: float = 0.0, setpoint_p: float = 0.0):
    """One control step. R: (3,3) base rotation (body->world).

    If `omega_world` (base angular velocity) is given, the D term uses the
    gyro signal d[-pitch, -roll]/dt ~ [-w_y, -w_x]; otherwise it falls back to
    the reference's finite difference of the error (pid.py:82).

    Returns (new_state, ctrl(3,) in [-10, 10]).
    """
    roll = jnp.arctan2(R[2, 1], R[2, 2])
    pitch = jnp.arctan2(-R[2, 0], jnp.sqrt(R[2, 1] ** 2 + R[2, 2] ** 2))
    err = jnp.stack([setpoint_p - pitch, setpoint_r - roll])

    integral = state.integral + err * params.dt
    if omega_world is not None:
        derivative = jnp.stack([-omega_world[1], -omega_world[0]])
    else:
        derivative = (err - state.prev_err) / params.dt
    u = params.k_p * err + params.k_i * integral + params.k_d * derivative

    angles = jnp.array([0.0, 2 * math.pi / 3, 4 * math.pi / 3])
    ctrl = u[1] * jnp.cos(angles) + u[0] * jnp.sin(angles)
    ctrl = jnp.clip(ctrl, -10.0, 10.0)
    return PIDState(integral=integral, prev_err=err), ctrl
