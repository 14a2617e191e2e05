"""Vision-enabled batched env: depth cameras + camera-throttling semantics.

Extends the proprio BallbotEnv (envs/env.py) with the reference's camera
observation path (ballbot_gym/envs/ballbot_env.py:745-767,824-827 and
observation_spaces.py:9-64):

  * two 64x64 depth cameras (sensors/depth.py raycaster) rendered at a
    throttled cadence with a staleness scalar `relative_image_timestamp`;
  * obs keys `rgbd_0`, `rgbd_1` shaped (C, H, W) in [0, 1] (depth_only: C=1)
    — or, in frozen-encoder mode, `vision_0`/`vision_1` latent vectors.

TPU-first design decisions (conscious deviations, documented):

  1. Global render cadence. The reference renders per-env whenever
     `data.time - prev_ts >= 1/frame_rate` (90 Hz config quantized by the
     2 ms physics step to exactly every 6 steps = 83.3 Hz effective,
     ballbot_env.py:389-413). A per-env condition under vmap becomes a
     select that pays the full render every step, so instead ALL envs render
     on a shared cadence derived from a lockstep `tick` counter that is
     never reset: `batch_step` reads env 0's tick as a SCALAR predicate
     before vmapping, which keeps the render inside a real `lax.cond` —
     executed once every `frame_skip` steps for the whole batch. Net effect:
     same 83.3 Hz refresh, same staleness signal; an episode that auto-resets
     mid-cadence sees an image up to one interval stale.

  2. Frozen-encoder feature caching. The reference's main training config
     freezes a pretrained CNN encoder (mlp_policy.py:52-138), making image
     features constant w.r.t. learned parameters. In that mode the env
     applies the frozen encoder AT RENDER TIME and stores the (2, latent)
     features in env state instead of (2, C, H, W) images — the PPO rollout
     buffer then holds the paper's R^56 observation instead of 8 kB of
     pixels per step, which is what makes vision training fit on-device at
     thousands of parallel envs.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from openballbot_rl_tpu.envs.env import BallbotEnv, EnvParams, EnvState, TerrainBank
from openballbot_rl_tpu.physics import hfield as hf
from openballbot_rl_tpu.sensors.depth import DepthCameraConfig, DepthCameras


@dataclasses.dataclass(frozen=True)
class VisionParams:
    """Camera configuration (reference env kwargs im_shape/camera config,
    ballbot_env.py:207-224)."""
    height: int = 64
    width: int = 64
    depth_only: bool = True       # ballbot_env.py:123 default
    frame_skip: int = 6           # 500 Hz / 6 = 83.3 Hz effective (90 Hz cfg)
    latent_dim: int = 20


@struct.dataclass
class VisionEnvState:
    core: EnvState
    vision: jnp.ndarray            # (2, C, H, W) images or (2, latent) features
    last_render_time: jnp.ndarray  # scalar f32 (sim time of last render)
    tick: jnp.ndarray              # int32 lockstep step counter (never reset)


class VisionBallbotEnv:
    """Composes BallbotEnv with the depth raycaster. Signature-compatible
    with BallbotEnv (reset/step/batch_reset/batch_step), so the PPO loop and
    the training CLI work unchanged.

    encode_fn: optional frozen encoder `(2, C, H, W) -> (2, latent)`; when
    given, obs carries `vision_0`/`vision_1` latents instead of images.
    """

    def __init__(self, params: EnvParams = EnvParams(),
                 vision: VisionParams = VisionParams(),
                 encode_fn: Optional[Callable] = None,
                 **env_kwargs):
        self.env = BallbotEnv(params=params, **env_kwargs)
        self.vp = vision
        self.params = params
        self.model = self.env.model
        self.encode_fn = encode_fn
        self.cams = DepthCameras(
            DepthCameraConfig(height=vision.height, width=vision.width),
            ball_radius=float(self.model.ball_radius))
        if vision.depth_only and self.cams.cfg.use_patch:
            # pre-warm the constant patch->polar resample matrix eagerly
            # (its geometry is fixed by the model), outside any jit trace;
            # RGBD and use_patch=False configs never read it (~128 MB HBM)
            from openballbot_rl_tpu.sensors.depth import _polar_resample_matrix
            n = self.model.hfield_n
            cell = 2.0 * float(self.model.hfield_half_extent) / (n - 1)
            _polar_resample_matrix(cell, self.cams.cfg.t_max,
                                   self.cams.cfg.patch_n)

    # ---------- rendering ----------
    def _render(self, bank: TerrainBank, core: EnvState) -> jnp.ndarray:
        if not self.vp.depth_only:
            # RGB+depth compat mode (reference depth_only=False): shaded
            # raycast, exact marcher only — off the paper's hot path
            sampler = hf.make_sampler(bank.heights, core.terrain_idx,
                                      self.model.hfield_half_extent,
                                      self.params.zscale)
            imgs = self.cams.render_rgbd(sampler, core.phys.base_pos,
                                         core.phys.base_quat,
                                         core.phys.ball_pos)   # (2, 4, H, W)
            if self.encode_fn is not None:
                return self.encode_fn(imgs)
            return imgs
        if self.cams.cfg.use_patch and bank.cam_tiles is not None:
            # TPU fastest path (round 4): aligned camera tiles — one
            # embedding-style row gather per camera instead of the per-env
            # dynamic_slice XLA serializes under vmap (see
            # sensors/depth.py render_tiles)
            n = self.model.hfield_n
            Tc = hf.tiles_per_dim(n, hf.CAM_TILE_SIZE, hf.CAM_TILE_STRIDE)
            depth = self.cams.render_tiles(
                bank.cam_tiles, core.terrain_idx, Tc, n,
                self.model.hfield_half_extent, self.params.zscale,
                core.phys.base_pos, core.phys.base_quat, core.phys.ball_pos)
        elif self.cams.cfg.use_patch:
            # TPU fast path: local patch + polar einsum (sensors/depth.py
            # render_patch) — the per-pixel gather march runs at ~78M
            # elements/s on TPU, unusable batched
            depth = self.cams.render_patch(
                bank.heights, core.terrain_idx,
                self.model.hfield_half_extent, self.params.zscale,
                core.phys.base_pos, core.phys.base_quat, core.phys.ball_pos)
        else:
            sampler = hf.make_sampler(bank.heights, core.terrain_idx,
                                      self.model.hfield_half_extent,
                                      self.params.zscale)
            depth = self.cams(sampler, core.phys.base_pos,
                              core.phys.base_quat,
                              core.phys.ball_pos)              # (2, H, W)
        imgs = depth[:, None, :, :]                            # (2, 1, H, W)
        if self.encode_fn is not None:
            return self.encode_fn(imgs)                        # (2, latent)
        return imgs

    def _vision_obs(self, vision, time, last_render_time) -> Dict:
        ts = (time - last_render_time)[None]
        if self.encode_fn is not None:
            return {"vision_0": vision[0], "vision_1": vision[1],
                    "relative_image_timestamp": ts}
        return {"rgbd_0": vision[0], "rgbd_1": vision[1],
                "relative_image_timestamp": ts}

    # ---------- reset ----------
    def reset(self, bank: TerrainBank, key) -> Tuple[VisionEnvState, Dict]:
        core, obs = self.env.reset(bank, key)
        vision = self._render(bank, core)
        state = VisionEnvState(core=core, vision=vision,
                               last_render_time=jnp.zeros((), jnp.float32),
                               tick=jnp.zeros((), jnp.int32))
        obs.update(self._vision_obs(vision, core.time, state.last_render_time))
        return state, obs

    # ---------- step ----------
    def step(self, bank: TerrainBank, state: VisionEnvState, action,
             do_render=None, do_refresh=None,
             ) -> Tuple[VisionEnvState, Dict, jnp.ndarray,
                        jnp.ndarray, Dict]:
        core, obs, reward, done, info = self.env.step(bank, state.core,
                                                      action, do_refresh)
        tick = state.tick + 1
        if do_render is None:
            do_render = tick % self.vp.frame_skip == 0

        # refresh images on the cadence (or keep the stale frame)
        def render(_):
            return self._render(bank, core), core.time

        def keep(_):
            # a just-reset env keeps its previous frame until the next tick;
            # its staleness clock restarts with the episode (time ~ 0)
            return state.vision, jnp.minimum(state.last_render_time, core.time)

        if isinstance(do_render, bool):
            # STATIC cadence: callers that know the render schedule at
            # trace time (blocked_vision_scan) skip the lax.cond. Measured
            # round 4: this is NOT faster — the dynamic cond is ~free
            # (static 4.34 vs dynamic 3.92 ms/step at B=1024; the ~3.4 ms
            # a device trace once attributed to the cond was a parent/child
            # double-count — see performance.md's measurement post-mortem).
            # Production uses the dynamic path; this branch exists for the
            # tested static machinery and for trace-time A/B experiments.
            vision, lrt = render(None) if do_render else keep(None)
        else:
            vision, lrt = jax.lax.cond(do_render, render, keep, None)
        new_state = VisionEnvState(core=core, vision=vision,
                                   last_render_time=lrt, tick=tick)
        vis_obs = self._vision_obs(vision, core.time, lrt)
        obs.update(vis_obs)
        # terminal obs must reflect the TERMINAL state, not the auto-reset
        # one: on a done+render tick `vision` is the new episode's frame, so
        # the terminal image is the pre-step cached frame with the terminal
        # staleness clock (<= one cadence interval stale, like any frame)
        t_terminal = state.core.time + self.model.dt * self.params.physics_substeps
        info["terminal_obs"] = {
            **info["terminal_obs"],
            **self._vision_obs(state.vision, t_terminal,
                               jnp.minimum(state.last_render_time,
                                           t_terminal)),
        }
        return new_state, obs, reward, done, info

    # ---------- batched closures ----------
    def batch_reset(self, bank: TerrainBank, keys):
        return jax.vmap(lambda k: self.reset(bank, k))(keys)

    def batch_step(self, bank: TerrainBank, states, actions, do_render=None):
        # lockstep cadences: env 0's ticks are the global clocks —
        # extracting them BEFORE vmap keeps do_render/do_refresh scalars,
        # so render and terrain-patch refresh stay real lax.conds
        # (1-in-cadence cost), not per-env selects. Callers that know the
        # cadence at TRACE time pass do_render as a python bool and skip
        # the conditional entirely (blocked_vision_scan).
        if do_render is None:
            do_render = (states.tick[0] + 1) % self.vp.frame_skip == 0
        do_refresh = None
        if self.env.params.terrain_patch and not self.env._tiles_mode(bank):
            do_refresh = jnp.logical_or(
                (states.core.tick[0] + 1)
                % self.env.params.terrain_patch_refresh == 0,
                states.core.bank_version[0] != bank.version)
        return jax.vmap(
            lambda s, a: self.step(bank, s, a, do_render, do_refresh))(
            states, actions)


def blocked_vision_scan(env: VisionBallbotEnv, phase: int, n_steps: int,
                        step_fn, carry):
    """Scan n_steps of a vision rollout with the render cadence resolved at
    TRACE time (round 4).

    Status: built to test the hypothesis that the dynamic render
    `lax.cond` was expensive; ON THE CHIP IT IS NOT — this static
    schedule measured slightly SLOWER than the dynamic cond (4.34 vs
    3.92 ms/step at B=1024; the ~3.4 ms a device trace attributed to the
    cond was a parent/child double-count — performance.md post-mortem).
    Production keeps the dynamic path; this stays as tested machinery for
    future schedule-static optimizations. Mechanism: every episode's tick
    counter is lockstep and never resets, so the whole batch's render
    schedule is known from `phase = int(tick0) % frame_skip`: structure
    the rollout as [prefix no-render steps] + scan over [1 render step +
    (fs-1) no-render steps] blocks + tail, each segment a lax.scan over a
    STATIC-do_render body — no conditional anywhere. Bit-identical to
    scanning the dynamic step (tests/unit/test_vision_env.py::TestBlockedScan).

    step_fn(carry, do_render: bool) -> (carry, out) performs ONE batched
    step (e.g. policy + env.batch_step(..., do_render=do_render)).
    Returns (carry, outs) with outs stacked time-major like lax.scan.
    """
    fs = env.vp.frame_skip
    phase = int(phase) % fs

    def no_render(c, _):
        return step_fn(c, False)

    if fs == 1:
        return jax.lax.scan(lambda c, _: step_fn(c, True), carry, None,
                            length=n_steps)

    outs = []
    i0 = (fs - 1 - phase) % fs          # steps before the first render
    n_pre = min(i0, n_steps)
    if n_pre > 0:
        carry, o = jax.lax.scan(no_render, carry, None, length=n_pre)
        outs.append(o)
    done = n_pre
    n_blocks = (n_steps - done) // fs
    if n_blocks > 0:
        def block(c, _):
            c, o_r = step_fn(c, True)
            c, o_n = jax.lax.scan(no_render, c, None, length=fs - 1)
            o = jax.tree.map(
                lambda a, b: jnp.concatenate([a[None], b], 0), o_r, o_n)
            return c, o
        carry, ob = jax.lax.scan(block, carry, None, length=n_blocks)
        outs.append(jax.tree.map(
            lambda x: x.reshape((n_blocks * fs,) + x.shape[2:]), ob))
        done += n_blocks * fs
    rem = n_steps - done
    if rem > 0:                          # tail starts on a render step
        carry, o_r = step_fn(carry, True)
        outs.append(jax.tree.map(lambda x: x[None], o_r))
        if rem > 1:
            carry, o_n = jax.lax.scan(no_render, carry, None,
                                      length=rem - 1)
            outs.append(o_n)
    if len(outs) == 1:
        return carry, outs[0]
    return carry, jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)
