"""Per-episode logging (reference: ballbot_gym/utils/logging.py:9-160).

The reference env dumps depth/RGB PNG frames, per-step reward-term .npy
arrays, and a terrain-seed history under /tmp/log_* during training
episodes. Here logging is a host-side post-step over recorded rollouts
(device-side logging would serialize the batched step), producing the same
artifact layout:

    <root>/rgbd_log_episode_<e>/depth/<t>.png     (vision envs)
    <root>/episode_<e>_rewards.npy                (per-step rewards)
    <root>/terrain_seeds.txt                      (append-only history)
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def save_episode_logs(root: str, episode: int, rewards: np.ndarray,
                      terrain_seed: int,
                      depth_frames: Optional[np.ndarray] = None) -> str:
    """Write one episode's artifacts; returns the log root."""
    os.makedirs(root, exist_ok=True)
    np.save(os.path.join(root, f"episode_{episode}_rewards.npy"),
            np.asarray(rewards, np.float32))
    with open(os.path.join(root, "terrain_seeds.txt"), "a") as f:
        f.write(f"{episode} {int(terrain_seed)}\n")
    if depth_frames is not None:
        from PIL import Image

        d = os.path.join(root, f"rgbd_log_episode_{episode}", "depth")
        os.makedirs(d, exist_ok=True)
        for t, frame in enumerate(np.asarray(depth_frames)):
            img = np.clip(frame[0] if frame.ndim == 3 else frame, 0, 1)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(d, f"{t}.png"))
    return root


def log_episode_rollout(env, bank, policy_fn, key, max_steps: int,
                        root: str, episode: int = 0) -> Dict:
    """Roll one episode recording per-step rewards (and depth frames for
    vision envs), then write the reference-layout logs."""
    import jax
    import jax.numpy as jnp

    state, obs = env.reset(bank, key)
    step = jax.jit(lambda s, a: env.step(bank, s, a))
    rewards, frames = [], []
    seed = None
    for t in range(max_steps):
        key, k = jax.random.split(key)
        if policy_fn is None:
            action = jax.random.uniform(k, (3,), minval=-1.0, maxval=1.0)
        else:
            action = policy_fn(obs, k)
        state, obs, r, done, info = step(state, action)
        rewards.append(float(r))
        if seed is None:
            seed = int(info["terrain_seed"])
        if "rgbd_0" in obs:
            frames.append(np.asarray(obs["rgbd_0"]))
        if bool(done):
            break
    save_episode_logs(root, episode, np.asarray(rewards), seed,
                      np.stack(frames) if frames else None)
    return dict(length=len(rewards), reward=float(np.sum(rewards)),
                terrain_seed=seed)
