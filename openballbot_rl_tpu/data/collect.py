"""Depth-frame collection from the batched env (reference:
ballbot_rl/data/collect.py:18-68).

The reference spawns a SubprocVecEnv with per-env PNG logging enabled and
drives it with a trained policy, harvesting /tmp/log_*/.../depth/*.png. Here
the batched vision env runs on device and frames are pulled at camera ticks —
one (B, 2, C, H, W) device->host transfer per effective camera frame instead
of per-process filesystem traffic.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def collect_depth_frames(env, bank, key, n_frames: int,
                         policy_fn: Optional[Callable] = None,
                         batch: int = 64,
                         verbose: bool = True) -> np.ndarray:
    """Roll the vision env and harvest depth frames at camera ticks.

    env: VisionBallbotEnv (without encode_fn — raw images needed).
    policy_fn: (obs_dict, key) -> actions (B, 3); None = random uniform.
    Returns (n_frames, C, H, W) float32 in [0, 1] (both cameras interleaved).
    """
    fs = env.vp.frame_skip
    key, k0 = jax.random.split(key)
    states, obs = jax.jit(env.batch_reset)(
        bank, jax.random.split(k0, batch))

    def act(obs, k):
        if policy_fn is None:
            return jax.random.uniform(k, (batch, 3), minval=-1.0, maxval=1.0)
        return policy_fn(obs, k)

    # bank as a jit argument (not a closure capture): the aligned tile bank
    # is large, and closed-over arrays ride inside the compile payload —
    # the axon relay's remote_compile rejects oversized requests (HTTP 413)
    @jax.jit
    def advance(bank, states, obs, key):
        """fs steps; the env's lockstep cadence renders on the last one."""
        def f(carry, _):
            states, obs, key = carry
            key, k = jax.random.split(key)
            actions = act(obs, k)
            states, obs, _, _, _ = env.batch_step(bank, states, actions)
            return (states, obs, key), None
        (states, obs, key), _ = jax.lax.scan(
            f, (states, obs, key), None, length=fs)
        frames = jnp.concatenate([obs["rgbd_0"], obs["rgbd_1"]], axis=0)
        return states, obs, key, frames

    out = []
    have = 0
    while have < n_frames:
        states, obs, key, frames = advance(bank, states, obs, key)
        f = np.asarray(frames)
        out.append(f)
        have += f.shape[0]
        if verbose and len(out) % 10 == 0:
            print(f"collected {have}/{n_frames} frames")
    return np.concatenate(out, axis=0)[:n_frames]


def save_frames_npz(path: str, frames: np.ndarray) -> None:
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez_compressed(path, frames=frames.astype(np.float32))


def export_png_tree(root: str, frames: np.ndarray, episode: int = 0) -> int:
    """Optional parity export: /<root>/rgbd_log_episode_<e>/depth/<i>.png
    (reference log layout, ballbot_gym/utils/logging.py:9-160)."""
    import os

    from PIL import Image

    d = f"{root}/rgbd_log_episode_{episode}/depth"
    os.makedirs(d, exist_ok=True)
    for i, f in enumerate(frames):
        img = (np.clip(f[0], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(f"{d}/{i}.png")
    return len(frames)
