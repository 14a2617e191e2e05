"""Physics engine tests.

Fast checks here; the full MuJoCo-oracle cross-validation lives in
tools/validate_physics.py and tests/integration/test_mujoco_oracle.py.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openballbot_rl_tpu.physics import ContactParams, init_state, step
from openballbot_rl_tpu.physics import engine as E
from openballbot_rl_tpu.physics.hfield import (
    sample_height_grad, spawn_height_offset, surface_normal)
from openballbot_rl_tpu.physics.rotations import quat_to_mat


@pytest.fixture(scope="module")
def setup(ballbot_model):
    m = ballbot_model
    cp = ContactParams()
    terrain = jnp.zeros((m.hfield_n, m.hfield_n), jnp.float32)
    return m, cp, terrain


def test_hfield_sampling():
    t = jnp.zeros((5, 5), jnp.float32).at[2, 3].set(1.0)
    # world->grid: 5x5 over [-E,E]; cell centers at -E..E step E/2 (E=5 here)
    h, dhx, dhy = sample_height_grad(t, 2.5, 0.0, 5.0, 2.0)
    assert float(h) == pytest.approx(2.0)  # row 2 (y=0), col 3 (x=2.5), zscale 2
    n = np.asarray(surface_normal(dhx, dhy))
    assert n[2] > 0


def test_spawn_height_offset():
    t = jnp.zeros((61, 61), jnp.float32).at[30, 31].set(0.5)
    off = spawn_height_offset(t, 2.0)
    assert float(off) == pytest.approx(0.5 * 2.0 + 0.01)
    off_far = spawn_height_offset(t.at[30, 31].set(0).at[1, 1].set(0.9), 2.0)
    assert float(off_far) == pytest.approx(0.01)


def test_ball_rests_on_flat_terrain(setup):
    m, cp, terrain = setup
    s = init_state(m, 0.01)
    # drop the ball alone far from the robot to avoid interaction
    s = s.replace(base_pos=jnp.array([3.0, 3.0, 2.0], jnp.float32))
    stepf = jax.jit(functools.partial(step, m, cp))

    def roll(s, n):
        def f(s, _):
            return stepf(terrain, 2.0, s, jnp.zeros(3)), None
        return jax.lax.scan(f, s, None, length=n)[0]

    s = jax.jit(functools.partial(roll, n=1000))(s)
    # ball COM settles near its radius with ~mm penetration
    assert abs(float(s.ball_pos[2]) - m.ball_radius) < 0.005
    assert abs(float(s.ball_vel[2])) < 0.01


def test_ball_rolls_with_initial_velocity(setup):
    m, cp, terrain = setup
    s = init_state(m, 0.0)
    s = s.replace(base_pos=jnp.array([4.0, 4.0, 2.0], jnp.float32),
                  ball_pos=jnp.array([0.0, 0.0, m.ball_radius], jnp.float32),
                  ball_vel=jnp.array([0.5, 0.0, 0.0], jnp.float32))
    stepf = jax.jit(functools.partial(step, m, cp))

    @jax.jit
    def roll(s):
        def f(s, _):
            return stepf(terrain, 2.0, s, jnp.zeros(3)), None
        return jax.lax.scan(f, s, None, length=500)[0]

    s1 = roll(s)
    # rolling without slipping: omega_y ~ v_x / r
    vx = float(s1.ball_vel[0])
    wy = float(s1.ball_angvel[1])
    assert vx > 0.2                     # keeps moving
    assert wy == pytest.approx(vx / m.ball_radius, rel=0.15)
    assert float(s1.ball_pos[0]) > 0.15  # traveled


def test_energy_sane_at_rest(setup):
    """Robot resting on ball: no energy injection (velocities stay bounded)."""
    m, cp, terrain = setup
    s = init_state(m, 0.01)

    @jax.jit
    def roll(s):
        def f(s, _):
            s = step(m, cp, terrain, 2.0, s, jnp.zeros(3))
            return s, jnp.max(jnp.abs(s.ball_vel))
        return jax.lax.scan(f, s, None, length=1000)
    _, maxv = roll(s)
    assert float(jnp.max(maxv)) < 1.5  # bounded during drop/settle/tip


@pytest.mark.integration
def test_pid_balances_10k_steps(setup):
    """The framework's install sanity check (counterpart of the reference's
    scripts/test_pid.py): tuned gyro-PID keeps tilt < 5 degrees for 20 s."""
    from openballbot_rl_tpu.controllers.pid import PIDParams, pid_act, pid_init

    m, cp, terrain = setup
    pp = PIDParams(dt=m.dt)

    @jax.jit
    def run(s0):
        def f(carry, _):
            s, ps = carry
            R = quat_to_mat(s.base_quat)
            ps, ctrl = pid_act(pp, ps, R, omega_world=s.base_angvel)
            s = step(m, cp, terrain, 2.0, s, -ctrl)
            return (s, ps), R[2, 2]
        return jax.lax.scan(f, (s0, pid_init()), None, length=10000)[1]

    upz = run(init_state(m, 0.01))
    tilt = np.degrees(np.arccos(np.clip(np.asarray(upz), -1, 1)))
    assert tilt.max() < 5.0, f"max tilt {tilt.max():.2f} deg"
    assert tilt[-1] < 1.0


def test_step_is_deterministic(setup):
    m, cp, terrain = setup
    s = init_state(m, 0.01)
    f = jax.jit(functools.partial(step, m, cp))
    a = f(terrain, 2.0, s, jnp.ones(3))
    b = f(terrain, 2.0, s, jnp.ones(3))
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_vmap_batch(setup):
    """The step function vmaps over env batches (the TPU execution model)."""
    m, cp, terrain = setup
    B = 8
    s = init_state(m, 0.01)
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), s)
    terr = jnp.broadcast_to(terrain, (B,) + terrain.shape)
    ctrl = jnp.zeros((B, 3))
    zs = jnp.full((B,), 2.0)
    out = jax.jit(jax.vmap(functools.partial(step, m, cp)))(terr, zs, batch, ctrl)
    assert out.base_pos.shape == (B, 3)
    # identical inputs -> identical outputs across the batch
    bp = np.asarray(out.base_pos)
    np.testing.assert_allclose(bp, np.tile(bp[0], (B, 1)), atol=0)
