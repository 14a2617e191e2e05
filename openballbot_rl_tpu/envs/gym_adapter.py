"""Gymnasium adapter: the reference's `gym.make("ballbot-v0.1")` surface.

Wraps the functional batched env (envs/env.py) in a classic stateful
Gymnasium Env so code written against the reference
(ballbot_gym/__init__.py:36-53 registration; ballbot_env.py:157-178 kwargs)
ports with a one-line change. The adapter holds one env instance's state,
jit-compiles reset/step once, and converts to numpy at the boundary.

Differences from the reference surface (documented):
  * GUI=True is accepted but maps to offline rendering — `render()` returns
    a raytraced frame (viz/scene.py) instead of opening a MuJoCo viewer.
  * terminal observations are exact: the obs returned at `terminated=True`
    is the pre-reset obs (info["terminal_obs"] from the functional step).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

try:  # gymnasium required only for the adapter surface, not the core
    import gymnasium as _gym

    _EnvBase = _gym.Env
except ImportError:  # pragma: no cover
    _EnvBase = object


class BallbotGymEnv(_EnvBase):
    """Gymnasium-style env over the functional core.

    Supported kwargs mirror the reference env (ballbot_env.py:157-178):
    terrain_type, terrain_config, reward_config, env_config, max_ep_steps,
    im_shape, disable_cameras, eval_env, GUI (accepted, ignored).
    """

    metadata = {"render_modes": ["rgb_array"], "render_fps": 30}

    def __init__(self, terrain_type: str = "perlin",
                 terrain_config: Optional[Dict] = None,
                 reward_config: Optional[Dict] = None,
                 env_config: Optional[Dict] = None,
                 max_ep_steps: int = 4000,
                 im_shape: Tuple[int, int] = (64, 64),
                 disable_cameras: bool = True,
                 depth_only: bool = True,    # ballbot_env.py:123 default
                 eval_env: Any = False,
                 GUI: bool = False,                      # noqa: N803 — ref API
                 bank_size: int = 16,
                 render_mode: str = "rgb_array",
                 **_ignored):
        import jax

        from openballbot_rl_tpu.envs.env import make_env_from_config
        from openballbot_rl_tpu.envs import make_terrain_bank

        config = {
            "problem": {
                "terrain": {"type": terrain_type,
                            "config": dict(terrain_config or {})},
                "reward": (reward_config
                           or {"type": "directional",
                               "config": {"target_direction": [0.0, 1.0]}}),
            },
            "env": {"max_ep_steps": max_ep_steps, **dict(env_config or {})},
            "camera": {"enabled": not disable_cameras,
                       "height": im_shape[0], "width": im_shape[1],
                       "disable_rgb": depth_only},
        }
        self._env, terrain_gen = make_env_from_config(config)
        self.render_mode = render_mode

        fixed_seed = (terrain_config or {}).get("seed")
        if isinstance(eval_env, (list, tuple)) and len(eval_env) == 2:
            # reference eval_env=[True, seed] convention (utils.py:40-50)
            fixed_seed = fixed_seed if fixed_seed is not None else eval_env[1]
        self._bank = make_terrain_bank(
            terrain_gen, self._env.model.hfield_n, self._env.params.zscale,
            jax.random.PRNGKey(0 if fixed_seed is None else int(fixed_seed)),
            bank_size, fixed_seed=fixed_seed,
            half_extent=float(self._env.model.hfield_half_extent))

        self._jit_reset = jax.jit(self._env.reset)
        self._jit_step = jax.jit(self._env.step)
        self._key = jax.random.PRNGKey(0)
        self._state = None
        self._needs_reset = True

    # ---------- Gymnasium API ----------
    def reset(self, *, seed: Optional[int] = None, options=None):
        import jax

        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        self._state, obs = self._jit_reset(self._bank, k)
        self._needs_reset = False
        return self._to_np(obs), {}

    def step(self, action):
        if self._needs_reset:
            raise RuntimeError("call reset() before step() after an episode "
                               "ends")
        import jax.numpy as jnp

        self._state, obs, reward, done, info = self._jit_step(
            self._bank, self._state, jnp.asarray(action, jnp.float32))
        terminated = bool(done)
        if terminated:
            # Gym semantics: return the TERMINAL obs, not the auto-reset one
            obs = info["terminal_obs"]
            self._needs_reset = True
        out_info = {
            "failure": bool(info["failure"]),
            "step_counter": int(info["step_counter"]),
            "episode_return": float(info["episode_return"]),
            "terrain_seed": int(info["terrain_seed"]),
        }
        # reference quirk (SURVEY.md §2.5.5): max-steps end reports
        # terminated=True, truncated stays False
        return (self._to_np(obs), float(reward), terminated, False, out_info)

    def render(self):
        import jax.numpy as jnp

        from openballbot_rl_tpu.physics import hfield as hf
        from openballbot_rl_tpu.viz.scene import render_scene

        core = getattr(self._state, "core", self._state)
        sampler = hf.make_sampler(self._bank.heights, core.terrain_idx,
                                  self._env.model.hfield_half_extent,
                                  self._env.params.zscale)
        frame = render_scene(sampler, core.phys.base_pos, core.phys.base_quat,
                             core.phys.ball_pos)
        return (np.asarray(frame) * 255).astype(np.uint8)

    def close(self):
        pass

    # ---------- spaces (lazy, gymnasium optional) ----------
    @property
    def observation_space(self):
        import gymnasium as gym

        box = lambda shape: gym.spaces.Box(-np.inf, np.inf, shape, np.float32)
        spaces = {k: box((3,)) for k in
                  ("orientation", "angular_vel", "vel", "motor_state",
                   "actions")}
        if getattr(self._env, "vp", None) is not None:
            vp = self._env.vp
            nchan = 1 if vp.depth_only else 4
            spaces["rgbd_0"] = gym.spaces.Box(
                0.0, 1.0, (nchan, vp.height, vp.width), np.float32)
            spaces["rgbd_1"] = gym.spaces.Box(
                0.0, 1.0, (nchan, vp.height, vp.width), np.float32)
            spaces["relative_image_timestamp"] = box((1,))
        return gym.spaces.Dict(spaces)

    @property
    def action_space(self):
        import gymnasium as gym

        return gym.spaces.Box(-1.0, 1.0, (3,), np.float32)

    @staticmethod
    def _to_np(obs):
        return {k: np.asarray(v) for k, v in obs.items()}


def register_gym_env() -> bool:
    """Register `ballbot-v0.1` with Gymnasium if available (the reference's
    import side effect, ballbot_gym/__init__.py:36-53)."""
    try:
        import gymnasium as gym
    except ImportError:
        return False
    try:
        gym.register(id="ballbot-v0.1",
                     entry_point="openballbot_rl_tpu.envs.gym_adapter:"
                                 "BallbotGymEnv")
        return True
    except Exception:  # already registered
        return True
