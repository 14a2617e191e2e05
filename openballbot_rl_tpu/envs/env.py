"""Functional ballbot environment: pure reset/step over struct-of-arrays state.

TPU-first counterpart of the reference Gym env (ballbot_gym/envs/
ballbot_env.py, the 1137-line BBotSimulation). Instead of a stateful object
stepped one process per env (SubprocVecEnv, train.py:82-97), the env is a pair
of pure functions

    reset: (params, bank, key)           -> (EnvState, obs)
    step:  (params, bank, EnvState, act) -> (EnvState, obs, reward, done, info)

vmapped over thousands of envs and scanned over time, entirely on device.

Reference semantics preserved (SURVEY.md §2.5 quirk list):
  1. action sign flip: applied torque = -(10 * action), clipped (+-10)
     (ballbot_env.py:901-907).
  3. obs clipping: vel / angular_vel clipped to +-2; motor_state =
     wheel_vel / max_wheel_velocity clipped +-2 (:783-800).
  5. max-steps end reported as terminated (never truncated) (:982-985).
  6. survival bonus +0.02 only when not tilted; directional term * 0.01;
     action reg -0.0001 * ||a||^2 (:929-1020).
  7. tilt failure: angle(base up, -gravity) > 20 deg (:987-1017).
  8. spawn height: max terrain height in the ball window + 1 cm (:528-565);
     ramp/gradient terrains get a config-derived vertical scale (:486-498).
  9. per-episode terrain seed drawn from the env RNG in [0, 10000) (:504-513).

Conscious deviations (documented):
  * cvel convention: the reference reads data.cvel[:3] as "linear velocity"
    (:794-796), but MuJoCo's cvel is [angular; linear] — so the repo actually
    rewards base *angular* velocity, contradicting its own docstrings and the
    paper. Default here is the paper-correct mapping (obs["vel"] = linear
    velocity of the robot COM); set EnvParams.cvel_swap=True to reproduce the
    repo's literal behavior.
  * terrain bank: fresh per-episode terrain generation inside a vmapped step
    would regenerate for every env every step. Instead episodes draw uniformly
    from a bank of pre-generated terrains (one per seed); the bank is
    regenerated on the host/per-iteration cadence. With bank_size >= 64 the
    training distribution is statistically equivalent to the reference's
    seed in [0, 10000) draw; exact per-episode regeneration remains available
    for evaluation via bank_size=1 + fixed seed.
  * auto-reset: a done env is re-initialized in the same step call (standard
    scan-time RL); the obs returned alongside done=True is the *new* episode's
    first obs. The reference never bootstraps terminated episodes (quirk 5 —
    SB3 sees terminated=True even at max steps), so the learner needs no
    terminal-observation channel.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from openballbot_rl_tpu.physics import hfield as hf
from openballbot_rl_tpu.physics.engine import (
    ContactParams, PhysState, init_state, step as phys_step)
from openballbot_rl_tpu.physics.model import BallbotModel, make_model
from openballbot_rl_tpu.physics.rotations import quat_to_mat, quat_to_rotvec


@dataclasses.dataclass(frozen=True)
class EnvParams:
    """Static env configuration (closed over by jit). Mirrors the reference
    env kwargs/env_config (ballbot_env.py:157-249)."""
    max_ep_steps: int = 4000            # ballbot_env.py:221
    max_allowed_tilt: float = 20.0      # degrees, :222
    max_wheel_velocity: float = 10.0    # :223
    reward_scale: float = 0.01          # :229
    action_reg_coef: float = -0.0001    # :230
    survival_bonus: float = 0.02        # :231
    cvel_swap: bool = False             # reproduce repo cvel bug (see module doc)
    physics_substeps: int = 1           # physics steps per env step (1 = 500 Hz ctrl)
    zscale: float = 2.0                 # hfield vertical scale (ballbot.xml:23)
    # Per-env local terrain patch (gather-free sampling; bit-exact vs the
    # bank sampler while queries stay inside the patch — hfield.
    # make_patch_sampler). With terrain_tiles (default) the patch is the
    # pre-sliced aligned tile nearest the robot, re-selected STATELESSLY
    # every step by one embedding-style row gather (hfield.make_tiles /
    # tile_select) — no refresh cadence, no cached patch state. When the
    # bank carries no tiles (or terrain_tiles=False), the legacy round-2
    # cadence-refresh cache below applies: 32 cells = 1.1 m; refreshing
    # every 16 steps tolerates >5 m/s of drift against the ~0.5 m margin.
    terrain_patch: bool = True
    terrain_tiles: bool = True
    terrain_patch_size: int = 32
    terrain_patch_refresh: int = 16
    # Tap implementation for tiles mode (round 5): "onehot" = the XLA
    # flat-index one-hot reductions over the materialized (B, P*P) row
    # gather; "pallas_rows" = XLA row gather + Pallas tap kernel (no HBM
    # round-trip for the taps); "pallas_fused" = rows DMA'd HBM->VMEM
    # inside the kernel (the gather output never exists in HBM). All three
    # are bit-identical (ops/pallas_taps.py, test_patch_sampler).
    terrain_taps: str = "onehot"


@struct.dataclass
class EnvState:
    phys: PhysState
    step_counter: jnp.ndarray      # int32
    prev_action: jnp.ndarray       # (3,)
    terrain_idx: jnp.ndarray       # int32 index into the bank
    rng: jnp.ndarray               # PRNG key
    episode_return: jnp.ndarray    # G_tau accumulator (ballbot_env.py:1024)
    time: jnp.ndarray              # sim time (s)
    patch: jnp.ndarray             # (P, P) cached local terrain (or (1, 1))
    patch_ij: jnp.ndarray          # (2,) int32 slice origin (row, col)
    tick: jnp.ndarray              # int32 lockstep counter (never reset)
    bank_version: jnp.ndarray      # int32 bank generation the patch is from


@struct.dataclass
class TerrainBank:
    """Pre-generated terrains + spawn offsets. heights: (K, n, n) in [0,1].

    `version` distinguishes bank GENERATIONS (curriculum regen swaps the
    bank under running episodes): when an env's cached terrain patch was
    sliced from a different version, the next step force-refreshes it, so
    the patch path tracks bank swaps exactly like the direct sampler.
    """
    heights: jnp.ndarray
    spawn_offsets: jnp.ndarray     # (K,)
    seeds: jnp.ndarray             # (K,) int32 (for logging/repro)
    version: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))
    # aligned P x P tiles, flat (K*T*T, P*P) — the stateless patch supply
    # (hfield.make_tiles). None = legacy cadence-refresh patch path.
    tiles: Optional[jnp.ndarray] = None
    # aligned CAMERA tiles, flat (K*Tc*Tc, Pc*Pc) bf16 raw heights — the
    # renderer's patch supply (sensors/depth.py render_tiles). None = the
    # renderer slices its patch per env (render_patch). Built on demand by
    # add_cam_tiles / make_terrain_bank(build_cam_tiles=True); only vision
    # envs read it.
    cam_tiles: Optional[jnp.ndarray] = None


def add_cam_tiles(bank: TerrainBank) -> TerrainBank:
    """Attach the renderer's aligned camera-tile supply to a bank (no-op if
    already present). Tiles are bf16 raw heights: the renderer downcasts
    its patch to bf16 before the MXU polar resample anyway."""
    if bank.cam_tiles is not None:
        return bank
    return bank.replace(cam_tiles=hf.make_tiles(
        bank.heights, hf.CAM_TILE_SIZE, hf.CAM_TILE_STRIDE,
        dtype=jnp.bfloat16))


def make_terrain_bank(gen: Callable, n: int, zscale: float, key,
                      bank_size: int, fixed_seed: Optional[int] = None,
                      use_native: Optional[bool] = None,
                      build_tiles: bool = True,
                      build_cam_tiles: bool = False,
                      half_extent: float = 5.0) -> TerrainBank:
    """Generate a bank of terrains with per-episode seed semantics.

    gen: a configured terrain closure (core.factories.create_terrain output).
    Seeds are drawn uniformly from [0, 10000) like the reference
    (ballbot_env.py:506) unless fixed_seed is given.

    use_native: generate the bank with the C++ OpenMP generator
    (native/libobb_terrain.so, value-parity with the JAX path) — host cores
    do the work so bank regeneration overlaps device training. None = auto:
    use it when the library is built and the terrain supports it.

    half_extent: the model's hfield_half_extent in meters — used only to
    validate the tile margin in WORLD space (ADVICE r4: a config-driven
    half-extent must not silently change the cell size under the check).
    Pass env.model.hfield_half_extent when building for a real env.
    """
    if fixed_seed is not None:
        seeds = jnp.full((bank_size,), int(fixed_seed), jnp.int32)
    else:
        seeds = jax.random.randint(key, (bank_size,), 0, 10000)

    heights = None
    is_perlin = getattr(gen, "terrain_type", None) == "perlin"
    if use_native and not is_perlin:
        raise RuntimeError(
            f"use_native=True but terrain '{getattr(gen, 'terrain_type', '?')}'"
            " has no native generator (only perlin)")
    if use_native is not False and is_perlin:
        from openballbot_rl_tpu.terrain.native import (
            native_available, perlin_bank_native)

        if native_available():
            import numpy as np

            cfg = getattr(gen, "terrain_config", {})
            heights = jnp.asarray(perlin_bank_native(
                np.asarray(seeds), n,
                scale=cfg.get("scale", 25.0),
                octaves=cfg.get("octaves", 4),
                persistence=cfg.get("persistence", 0.2),
                lacunarity=cfg.get("lacunarity", 2.0),
                amplitude=cfg.get("amplitude", 1.0)))
        elif use_native:
            raise RuntimeError("use_native=True but native terrain library "
                               "is not built (make -C native)")

    if heights is None:
        ttype = getattr(gen, "terrain_type", None)
        if ttype in ("hills", "mixed"):
            # concrete per-terrain seeds: hills' MT19937 rejection placement
            # runs eagerly on host and the traced graph is pure array ops —
            # no pure_callback, so the bank is generatable ON the TPU device
            # (the axon relay cannot execute host callbacks). This path is
            # HOST-ONLY in `seeds`: the MT19937 placement needs concrete
            # values, so calling make_terrain_bank under jit/vmap with traced
            # seeds is unsupported for hills/mixed.
            import numpy as np

            if isinstance(seeds, jax.core.Tracer):
                raise TypeError(
                    f"make_terrain_bank with terrain type '{ttype}' needs "
                    "concrete seeds (its MT19937 placement runs on host); "
                    "call it outside jit, or use a generator without host "
                    "randomness")
            heights = jnp.stack([
                jnp.asarray(gen(n, seed=int(s)), jnp.float32).reshape(n, n)
                for s in np.asarray(seeds)])
        else:
            def one(seed):
                return jnp.asarray(gen(n, seed=seed), jnp.float32).reshape(n, n)

            heights = jax.vmap(one)(seeds)
    offsets = jax.vmap(lambda t: hf.spawn_height_offset(t, zscale))(heights)
    # a fresh random version per generated bank: curriculum regen produces a
    # new generation, and envs holding patches from an older one refresh on
    # their next step (exactly matching the direct-sampler semantics)
    version = jax.random.randint(jax.random.fold_in(key, 0x5eed),
                                 (), 0, jnp.iinfo(jnp.int32).max)
    if build_tiles:
        # the tile margin is fixed in grid cells; fail loudly if this grid's
        # cell size shrinks it below the physics query footprint (ADVICE r3;
        # half_extent plumbed from the caller's model since ADVICE r4)
        hf.check_tile_margin(n, half_extent)
    tiles = hf.make_tiles(heights) if build_tiles else None
    bank = TerrainBank(heights=heights, spawn_offsets=offsets, seeds=seeds,
                       version=version, tiles=tiles)
    if build_cam_tiles:
        bank = add_cam_tiles(bank)
    return bank


class BallbotEnv:
    """Binds model + params + components into jittable reset/step functions.

    All methods are pure (state in, state out) and vmap/scan compatible; the
    object itself is static configuration resolved before tracing (the
    registry/factory layer runs at construction, not at trace time).
    """

    def __init__(self,
                 params: EnvParams = EnvParams(),
                 reward_fn: Optional[Callable[[Dict], jnp.ndarray]] = None,
                 model: Optional[BallbotModel] = None,
                 contact_params: ContactParams = ContactParams()):
        self.params = params
        self.model = (model or make_model()).as_jnp()
        self.cp = contact_params
        if reward_fn is None:
            from openballbot_rl_tpu.rewards import DirectionalReward
            reward_fn = DirectionalReward(jnp.array([0.0, 1.0]))
        self.reward_fn = reward_fn
        # constant COM offset of the whole robot in the base frame (for the
        # linear-velocity obs; see module doc on cvel)
        import numpy as np
        m = self.model
        com = (float(m.m_base) * np.asarray(m.com_base)
               + float(m.m_wheel) * np.asarray(m.wheel_com).sum(0))
        self._robot_com_b = jnp.asarray(
            com / (float(m.m_base) + 3 * float(m.m_wheel)), jnp.float32)

    # ---------- observation ----------
    def obs_keys(self) -> Tuple[str, ...]:
        return ("orientation", "angular_vel", "vel", "motor_state", "actions")

    def _get_obs(self, s: PhysState, last_action: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        p = self.params
        rot_vec = quat_to_rotvec(s.base_quat)              # ballbot_env.py:778-779
        omega = s.base_angvel
        v_com = s.base_vel + jnp.cross(
            omega, quat_to_mat(s.base_quat) @ self._robot_com_b)
        omega_c = jnp.clip(omega, -2.0, 2.0)
        v_c = jnp.clip(v_com, -2.0, 2.0)                   # :799-800
        if p.cvel_swap:                                    # repo behavior
            vel_obs, angvel_obs = omega_c, v_c
        else:                                              # paper-correct
            vel_obs, angvel_obs = v_c, omega_c
        motor_state = jnp.clip(s.wheel_vel / p.max_wheel_velocity, -2.0, 2.0)
        return {
            "orientation": rot_vec,
            "angular_vel": angvel_obs,
            "vel": vel_obs,
            "motor_state": motor_state,
            "actions": last_action,
        }

    # ---------- terrain patch supply ----------
    def _tiles_mode(self, bank: TerrainBank) -> bool:
        """True when sampling runs off the bank's aligned tiles (static
        decision: `bank.tiles is None` is a pytree-structure property)."""
        return (self.params.terrain_patch and self.params.terrain_tiles
                and bank.tiles is not None)

    def _tiles_per_dim(self, bank: TerrainBank) -> int:
        T = hf.tiles_per_dim(bank.heights.shape[-1])
        K = bank.heights.shape[0]
        assert bank.tiles.shape[0] == K * T * T, (
            f"tile bank layout mismatch: {bank.tiles.shape} vs K={K}, T={T}")
        return T

    def _patch_center_origin(self, n: int) -> int:
        """Slice origin of a patch centered on the spawn point (world 0, 0) —
        identical to what extract_patch computes there."""
        P = self.params.terrain_patch_size
        return min(max(round((n - 1) / 2) - P // 2, 0), n - P)

    def _spawn_patch(self, bank: TerrainBank, idx,
                     center_patches: Optional[jnp.ndarray] = None):
        """Patch for a fresh episode (robot spawns at world (0, 0)).

        center_patches, when given, is the (K, P, P) stack of center slices
        of the whole bank: selecting by one-hot matmul keeps the auto-reset
        branch inside the vmapped step GATHER-FREE (a per-env dynamic_slice
        there would run as a batched gather every step, selected or not).
        """
        p = self.params
        n = bank.heights.shape[-1]
        c0 = self._patch_center_origin(n)
        if center_patches is None:
            P = p.terrain_patch_size
            patch = jax.lax.dynamic_slice(
                bank.heights, (idx, jnp.asarray(c0), jnp.asarray(c0)),
                (1, P, P))[0]
        else:
            K = center_patches.shape[0]
            onehot = (jnp.arange(K) == idx).astype(center_patches.dtype)
            # HIGHEST: a default-precision dot would bf16-truncate the
            # selected heights on TPU and break patch/sampler bit-exactness
            patch = jnp.einsum("k,kij->ij", onehot, center_patches,
                               precision=jax.lax.Precision.HIGHEST)
        return patch, jnp.array([c0, c0], jnp.int32)

    # ---------- reset ----------
    def reset(self, bank: TerrainBank, key,
              center_patches: Optional[jnp.ndarray] = None,
              ) -> Tuple[EnvState, Dict]:
        k_terr, k_state = jax.random.split(key)
        idx = jax.random.randint(k_terr, (), 0, bank.heights.shape[0])
        phys = init_state(self.model, bank.spawn_offsets[idx])
        if self.params.terrain_patch and not self._tiles_mode(bank):
            patch, patch_ij = self._spawn_patch(bank, idx, center_patches)
        else:
            # direct or tiles mode: no cached patch state (tiles re-select
            # statelessly from base_pos every step)
            patch = jnp.zeros((1, 1), bank.heights.dtype)
            patch_ij = jnp.zeros((2,), jnp.int32)
        state = EnvState(
            phys=phys,
            step_counter=jnp.zeros((), jnp.int32),
            prev_action=jnp.zeros(3, jnp.float32),
            terrain_idx=idx,
            rng=k_state,
            episode_return=jnp.zeros((), jnp.float32),
            time=jnp.zeros((), jnp.float32),
            patch=patch,
            patch_ij=patch_ij,
            tick=jnp.zeros((), jnp.int32),
            bank_version=bank.version,
        )
        return state, self._get_obs(phys, state.prev_action)

    # ---------- step ----------
    def step(self, bank: TerrainBank, state: EnvState, action: jnp.ndarray,
             do_refresh=None,
             ) -> Tuple[EnvState, Dict, jnp.ndarray, jnp.ndarray, Dict]:
        p = self.params
        m = self.model
        n = bank.heights.shape[-1]
        tick = state.tick + 1
        # a state reset under one bank mode must not be stepped under the
        # other: tiles-mode states carry a (1, 1) dummy patch that the
        # legacy path would silently sample as zero terrain (ADVICE r3).
        # Shapes are static, so this fails at trace time, not per step.
        if p.terrain_patch:
            want = (1, 1) if self._tiles_mode(bank) else \
                (p.terrain_patch_size, p.terrain_patch_size)
            assert state.patch.shape == want, (
                f"state.patch shape {state.patch.shape} does not match the "
                f"bank's patch mode (expected {want}): this state was reset "
                "under a bank with a different tiles= configuration")
        if self._tiles_mode(bank):
            # stateless aligned-tile patch (round 3): select the tile
            # nearest the robot by index arithmetic and fetch it with one
            # embedding-style row gather — no cached patch, no refresh
            # cadence, no bank-version tracking (a curriculum bank swap
            # replaces `tiles` wholesale, so every env is consistent on
            # the very step it happens)
            P = hf.TILE_SIZE
            T = self._tiles_per_dim(bank)
            flat, patch_ij = hf.tile_select(
                state.terrain_idx, state.phys.base_pos[0],
                state.phys.base_pos[1], n, m.hfield_half_extent, T)
            if p.terrain_taps != "onehot":
                # round 5: gather+taps through the Pallas kernel under
                # vmap (bit-identical; see EnvParams.terrain_taps)
                terrain = hf.make_tile_tap_sampler(
                    bank.tiles, flat, patch_ij, n, m.hfield_half_extent,
                    p.zscale, impl=p.terrain_taps)
            else:
                patch = jnp.take(bank.tiles, flat, axis=0).reshape(P, P)
                terrain = hf.make_patch_sampler(patch, patch_ij, n,
                                                m.hfield_half_extent,
                                                p.zscale)
            patch, patch_ij = state.patch, state.patch_ij   # dummies carried
            bank_version = bank.version
        elif p.terrain_patch:
            # gather-free sampling from the per-env cached patch; the slice
            # refresh runs on a lockstep cadence (batch_step passes a SCALAR
            # do_refresh so this stays a real lax.cond, not a select)
            if do_refresh is None:
                # a curriculum bank swap must reach the physics on THIS
                # step, exactly like the direct sampler would; batch_step
                # folds the same version check in as a SCALAR (adding it
                # here per-env would demote the cond to a select under vmap)
                do_refresh = jnp.logical_or(
                    tick % p.terrain_patch_refresh == 0,
                    state.bank_version != bank.version)

            def refresh(_):
                pa, pij = hf.extract_patch(
                    bank.heights, state.terrain_idx, state.phys.base_pos[0],
                    state.phys.base_pos[1], n, m.hfield_half_extent,
                    p.terrain_patch_size)
                return pa, pij, bank.version

            def keep(_):
                return state.patch, state.patch_ij, state.bank_version

            patch, patch_ij, bank_version = jax.lax.cond(
                do_refresh, refresh, keep, None)
            terrain = hf.make_patch_sampler(patch, patch_ij, n,
                                            m.hfield_half_extent, p.zscale)
        else:
            patch, patch_ij = state.patch, state.patch_ij
            bank_version = bank.version
            # point-sampler over the bank: avoids materializing a per-env
            # (n, n) terrain slice under vmap (see hfield.make_sampler)
            terrain = hf.make_sampler(bank.heights, state.terrain_idx,
                                      m.hfield_half_extent, p.zscale)

        # action pipeline (ballbot_env.py:901-907): scale, clip, negate —
        # then the actuator ctrlrange clamp MuJoCo applies on top
        # (ballbot.xml:82-87, +-10), which matters when max_wheel_velocity
        # is configured above the actuator limit
        ctrl = jnp.clip(action * p.max_wheel_velocity,
                        -p.max_wheel_velocity, p.max_wheel_velocity)
        ctrl = jnp.clip(ctrl, -m.ctrl_limit, m.ctrl_limit)
        torque = -ctrl

        phys = state.phys
        for _ in range(p.physics_substeps):
            phys = phys_step(m, self.cp, terrain, p.zscale, phys, torque)

        action_f = action.astype(jnp.float32)
        obs = self._get_obs(phys, action_f)

        # reward terms (:924-937)
        reward = self.reward_fn(obs) * p.reward_scale
        reward = reward + p.action_reg_coef * jnp.sum(action_f ** 2)

        step_counter = state.step_counter + 1
        hit_max = step_counter >= p.max_ep_steps           # :982-985

        # tilt (:987-1017): angle between base up axis and -gravity
        R = quat_to_mat(phys.base_quat)
        tilt_cos = R[2, 2]
        tilted = tilt_cos < jnp.cos(jnp.radians(p.max_allowed_tilt))
        reward = reward + jnp.where(tilted, 0.0, p.survival_bonus)  # :1018-1020

        done = jnp.logical_or(hit_max, tilted)
        episode_return = state.episode_return + reward
        info = {
            "failure": tilted,
            "step_counter": step_counter,
            "pos2d": phys.base_pos[:2],
            "episode_return": episode_return,
            "terrain_seed": bank.seeds[state.terrain_idx],
            # pre-auto-reset obs: consumers that need Gym's terminal
            # observation semantics (envs/gym_adapter.py) read it here;
            # unused consumers pay nothing (dead-code eliminated by XLA)
            "terminal_obs": obs,
        }

        # auto-reset (replaces Gym reset-on-done; see module doc)
        next_key, reset_key = jax.random.split(state.rng)
        carry_state = EnvState(
            phys=phys,
            step_counter=step_counter,
            prev_action=action_f,
            terrain_idx=state.terrain_idx,
            rng=next_key,
            episode_return=episode_return,
            time=state.time + m.dt * p.physics_substeps,
            patch=patch,
            patch_ij=patch_ij,
            tick=tick,
            bank_version=bank_version,
        )
        center_patches = None
        if p.terrain_patch and not self._tiles_mode(bank):
            # center slices of the whole bank via ONE static contiguous
            # slice (respawn is always at world (0, 0)); the reset branch
            # then selects by one-hot matmul — no per-env gather
            c0 = self._patch_center_origin(n)
            P = p.terrain_patch_size
            center_patches = jax.lax.dynamic_slice(
                bank.heights, (0, c0, c0), (bank.heights.shape[0], P, P))
        reset_state, reset_obs = self.reset(bank, reset_key, center_patches)
        new_state = jax.tree.map(
            lambda a, b: jnp.where(done, a, b), reset_state, carry_state)
        # the tick is a lockstep clock shared by the whole batch — it must
        # NOT reset with an episode or the refresh cadence would desync
        new_state = new_state.replace(tick=tick)
        new_obs = jax.tree.map(lambda a, b: jnp.where(done, a, b),
                               reset_obs, obs)
        return new_state, new_obs, reward, done, info

    # ---------- convenience: batched closures ----------
    def batch_reset(self, bank: TerrainBank, keys) -> Tuple[EnvState, Dict]:
        return jax.vmap(lambda k: self.reset(bank, k))(keys)

    def batch_step(self, bank: TerrainBank, states: EnvState, actions):
        # lockstep patch-refresh cadence: env 0's tick is the global clock —
        # extracting it BEFORE vmap keeps do_refresh a scalar, so the slice
        # refresh stays a real lax.cond (1-in-refresh cost), not a select
        do_refresh = None
        if self.params.terrain_patch and not self._tiles_mode(bank):
            # bank_version is uniform across the batch (everyone refreshes
            # on the same scalar cadence), so env 0 speaks for all
            do_refresh = jnp.logical_or(
                (states.tick[0] + 1) % self.params.terrain_patch_refresh == 0,
                states.bank_version[0] != bank.version)
        return jax.vmap(lambda s, a: self.step(bank, s, a, do_refresh))(
            states, actions)


def make_env_from_config(config: Dict[str, Any],
                         contact_params: ContactParams = ContactParams(),
                         ) -> Tuple[BallbotEnv, Callable]:
    """Build (env, terrain_generator) from a merged training/env config dict.

    Mirrors the reference's config plumbing: terrain/reward from
    problem.* (core/config.py:138-197), env knobs from env/camera sections
    (ballbot_env.py:207-249), the ramp/gradient dynamic z-scale rule
    (:486-498).
    """
    from openballbot_rl_tpu.core.config import get_component_config
    from openballbot_rl_tpu.core.factories import create_reward, create_terrain
    import math

    terrain_cfg = get_component_config(config, "terrain", default_type="perlin")
    reward_cfg = get_component_config(config, "reward", default_type="directional")
    if reward_cfg["type"] == "directional" and "target_direction" not in reward_cfg["config"]:
        reward_cfg = {"type": "directional",
                      "config": {**reward_cfg["config"],
                                 "target_direction": [0.0, 1.0]}}
    env_settings = config.get("env", {}) or {}
    reward_knobs = reward_cfg.get("config", {})

    # dynamic z-scale for angle-based terrains (ballbot_env.py:486-498)
    zscale = 2.0
    tc = terrain_cfg.get("config", {})
    if terrain_cfg["type"] == "ramp":
        zscale = 2 * 5.0 * math.tan(math.radians(tc.get("ramp_angle", 15.0)))
    elif terrain_cfg["type"] == "gradient":
        zscale = 2 * 5.0 * math.tan(math.radians(tc.get("max_slope", 20.0)))

    params = EnvParams(
        max_ep_steps=int(env_settings.get("max_ep_steps", 4000)),
        max_allowed_tilt=float(env_settings.get("max_allowed_tilt", 20.0)),
        max_wheel_velocity=float(env_settings.get("max_wheel_velocity", 10.0)),
        reward_scale=float(reward_knobs.get("scale", 0.01)),
        action_reg_coef=float(reward_knobs.get("action_reg_coef", -0.0001)),
        survival_bonus=float(reward_knobs.get("survival_bonus", 0.02)),
        cvel_swap=bool(env_settings.get("cvel_swap", False)),
        zscale=zscale,
        terrain_taps=str(env_settings.get("terrain_taps", "onehot")),
    )
    reward_fn = create_reward(reward_cfg)
    terrain_gen = create_terrain(terrain_cfg)

    # camera path (reference camera config + effective-rate quantization,
    # ballbot_env.py:207-224,389-413): frame_rate -> physics-step multiple
    cam = config.get("camera", {}) or {}
    if cam.get("enabled", False):
        from openballbot_rl_tpu.envs.vision import VisionBallbotEnv, VisionParams

        frame_rate = float(cam.get("frame_rate", 90.0))
        frame_skip = max(1, math.ceil((1.0 / frame_rate) / 0.002 - 1e-9))
        encode_fn = None
        frozen = config.get("frozen_cnn", "") or ""
        if frozen and not bool(cam.get("disable_rgb", True)):
            # channel-compat check (reference mlp_policy.py:68-113 validates
            # the loaded encoder against the obs channel count)
            raise ValueError(
                "frozen_cnn encoders are trained on depth-only (C=1) images; "
                "disable_rgb: false produces C=4 RGBD obs. Drop frozen_cnn "
                "or use depth-only cameras.")
        if frozen:
            from openballbot_rl_tpu.encoders.training import make_frozen_encoder
            encode_fn, _ = make_frozen_encoder(frozen)
        vp = VisionParams(height=int(cam.get("height", 64)),
                          width=int(cam.get("width", 64)),
                          depth_only=bool(cam.get("disable_rgb", True)),
                          frame_skip=frame_skip)
        env = VisionBallbotEnv(params=params, vision=vp, encode_fn=encode_fn,
                               reward_fn=reward_fn,
                               contact_params=contact_params)
        return env, terrain_gen

    env = BallbotEnv(params=params, reward_fn=reward_fn,
                     contact_params=contact_params)
    return env, terrain_gen
