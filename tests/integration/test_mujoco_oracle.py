"""Behavioral cross-validation against the patched-MuJoCo oracle.

tools/mj_patched_oracle.py reproduces the reference's MuJoCo source patch
(the anisotropic omniwheel contact frame, tools/mujoco_fix.patch) by editing
data.contact frames between pipeline stages — genuine MuJoCo collision
detection and constraint solving, semi-implicit Euler at 500 Hz.

What can and cannot be compared (documented in docs/design/parity.md):

  * An uncontrolled ballbot is an inverted pendulum. MuJoCo's numerical
    asymmetries tip the oracle within ~1 s while the JAX engine's perfectly
    symmetric model stays on the unstable equilibrium — so passive or
    long-horizon open-loop trajectory comparison is meaningless by
    construction.
  * The reference's own PID install check only balances on the PINNED old
    MuJoCo commit (Readme.md:102); it falls on modern MuJoCo with the patch
    emulated, so closed-loop parity vs this oracle is unverifiable here.
  * What IS comparable: short-horizon action-reaction invariants of the
    omniwheel contact, before tipping dominates. Spinning all three wheels
    torques the ball through the anisotropic contact's circumferential-grip
    direction; the body must yaw opposite the commanded wheel spin in BOTH
    simulators. A wrong tangent frame (e.g. the friction anisotropy rotated
    90 deg — exactly the bug the reference's MuJoCo patch fixes) flips or
    kills this response.

The quantitative M/bias/trajectory validation against unpatched MuJoCo
lives in tools/validate_physics.py (rel. err ~1e-5).
"""
import functools

import numpy as np
import pytest

pytest.importorskip("mujoco")
pytestmark = pytest.mark.slow

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N_STEPS = 150      # 0.3 s: omniwheel response visible, tipping not yet


def _mine_base_yaw_rate(torque):
    from openballbot_rl_tpu.physics import (
        ContactParams, init_state, make_model, step)

    m = make_model().as_jnp()
    terr = jnp.zeros((m.hfield_n, m.hfield_n), jnp.float32)
    s = init_state(m, 0.0)
    stepf = jax.jit(functools.partial(step, m, ContactParams(), terr, 2.0))

    @jax.jit
    def roll(s):
        def f(s, _):
            return stepf(s, jnp.asarray(torque, jnp.float32)), None
        return jax.lax.scan(f, s, None, length=N_STEPS)[0]

    s = roll(s)
    return float(s.base_angvel[2]), float(s.wheel_vel[0])


def _oracle_base_yaw_rate(torque):
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from tools.mj_patched_oracle import PatchedSim

    sim = PatchedSim()
    for _ in range(N_STEPS):
        sim.step(np.asarray(torque, np.float64))
    # qvel: base lin 0-2 (world), base rot 3-5, wheels 6-8, ball 9-14
    return float(sim.data.qvel[5]), float(sim.data.qvel[6])


@pytest.mark.parametrize("sign", [1.0, -1.0])
def test_omniwheel_yaw_reaction_matches_oracle(sign):
    """Symmetric wheel torque -> body yaws OPPOSITE the wheel spin, in both
    simulators, with wheel spin in the commanded direction."""
    torque = (1.5 * sign,) * 3
    my_yaw, my_wheel = _mine_base_yaw_rate(torque)
    or_yaw, or_wheel = _oracle_base_yaw_rate(torque)

    # wheels spin with the (negated-by-actuation? no: raw) command in both
    assert np.sign(my_wheel) == np.sign(or_wheel) != 0, (
        f"wheel spin directions disagree: mine {my_wheel:+.3f} "
        f"oracle {or_wheel:+.3f}")
    # yaw reaction opposite the command, in both
    assert np.sign(my_yaw) == -sign, f"my yaw {my_yaw:+.4f} vs torque {sign}"
    assert np.sign(or_yaw) == -sign, (
        f"oracle yaw {or_yaw:+.4f} vs torque {sign}")


def test_ball_supports_robot_in_both():
    """With zero torque for 0.3 s, neither sim lets the base fall through:
    the wheel-ball contact carries the weight."""
    from openballbot_rl_tpu.physics import (
        ContactParams, init_state, make_model, step)

    m = make_model().as_jnp()
    terr = jnp.zeros((m.hfield_n, m.hfield_n), jnp.float32)
    s = init_state(m, 0.0)
    stepf = jax.jit(functools.partial(step, m, ContactParams(), terr, 2.0))
    for _ in range(N_STEPS):
        s = stepf(s, jnp.zeros(3))
    assert float(s.base_pos[2]) > 0.2

    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from tools.mj_patched_oracle import PatchedSim

    sim = PatchedSim()
    for _ in range(N_STEPS):
        sim.step(np.zeros(3))
    assert float(sim.data.qpos[2]) > 0.2


# ---------------------------------------------------------------------------
# Quantified parity (round-2, VERDICT #4): tools/physics_parity_study.py
# bounds asserted here. Measured values (CPU, 2026-08): impulse rel err
# median 0.062 / p90 0.50 (cross-contact-model: compliant vs soft-constraint
# — see the study's docstring for why instantaneous qacc is not comparable);
# closed-loop base-pos divergence 0.012 m @ 125 steps, 0.033 m @ 250 steps;
# reference PID gains survive 399/25000 steps in the oracle.
# ---------------------------------------------------------------------------

def _study():
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from tools import physics_parity_study
    return physics_parity_study


def test_state_matched_impulse_bounded_on_uneven_terrain():
    """All contact types active (ball<->perlin hfield + 3 omniwheels),
    state-matched 20 ms impulse agreement with asserted tolerance."""
    out = _study().study_state_matched(n_probe=25)
    assert out["ncon_mean"] >= 4.0          # contacts actually active
    # bounds tightened toward measured values (r2: median 0.062, p90 0.50)
    # so a physics regression actually trips, with ~60% cross-contact-model
    # slack retained
    assert out["impulse_rel_err_median"] < 0.10, out
    assert out["impulse_rel_err_p90"] < 0.65, out


def test_closed_loop_divergence_bounded():
    """Same initial state + same 250-action trace on perlin terrain: the two
    simulators' base positions stay within centimeters (the strongest
    trajectory-level statement two different contact models + integrators
    permit on an inverted-pendulum plant)."""
    out = _study().study_closed_loop(n_steps=250)
    assert out["base_pos_div_125"] < 0.05, out
    assert out["base_pos_div_250"] < 0.15, out
    assert out["ball_pos_div_250"] < 0.6, out


def test_reference_pid_gains_fail_in_modern_mujoco():
    """docs/design/parity.md: the reference's PID install check (gains
    20,15,2, scripts/test_pid.py) balances only on the pinned old MuJoCo
    commit. Demonstrate in GENUINE modern MuJoCo (patched contact frames)
    that the gains fall within ~1 s — the deviation is environmental, not
    an engine bug. (The reference's own Readme pins the commit precisely
    because newer MuJoCo behaves differently.)"""
    out = _study().study_reference_pid(n_steps=3000)
    assert not out["balanced"]
    assert out["steps_survived"] < 1500   # measured: 399 (~0.8 s)
