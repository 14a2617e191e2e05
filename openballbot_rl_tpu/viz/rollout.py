"""Episode rollout capture + video rendering.

Shared engine for `ballbot-visualize-env` / `ballbot-visualize-model`
(reference: ballbot_rl/visualization/{visualize_env,visualize_model}.py).
The GUI viewer is replaced by an offline render: states are recorded on a
video cadence during a jitted rollout, then the scene raytracer renders all
frames in one vmapped call.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from openballbot_rl_tpu.physics import hfield as hf
from openballbot_rl_tpu.viz.scene import render_scene, save_video


def run_episode(env, bank, policy_fn: Optional[Callable], key,
                max_steps: int, capture_every: int = 16) -> Dict:
    """Roll one episode; capture base/ball/quat snapshots every
    `capture_every` steps (16 -> ~31 fps of sim time at 500 Hz)."""
    n_cap = max_steps // capture_every

    def body(carry, _):
        state, obs, key, done_seen, ret, length = carry

        def inner(carry, _):
            state, obs, key, done_seen, ret, length = carry
            key, k = jax.random.split(key)
            if policy_fn is None:
                action = jax.random.uniform(k, (3,), minval=-1.0, maxval=1.0)
            else:
                action = policy_fn(obs, k)
            new_state, new_obs, reward, done, info = env.step(bank, state, action)
            alive = 1.0 - done_seen
            # freeze the sim once the episode ended (no auto-reset teleport
            # in the recording)
            state = jax.tree.map(
                lambda old, new: jnp.where(done_seen > 0, old, new),
                state, new_state)
            obs = jax.tree.map(
                lambda old, new: jnp.where(done_seen > 0, old, new),
                obs, new_obs)
            ret = ret + reward * alive
            length = length + (1 - done_seen.astype(jnp.int32)) * 1
            done_seen = jnp.maximum(done_seen, done.astype(jnp.float32))
            return (state, obs, key, done_seen, ret, length), None

        (state, obs, key, done_seen, ret, length), _ = jax.lax.scan(
            inner, (state, obs, key, done_seen, ret, length), None,
            length=capture_every)
        phys = state.core.phys if hasattr(state, "core") else state.phys
        snap = dict(base_pos=phys.base_pos, base_quat=phys.base_quat,
                    ball_pos=phys.ball_pos,
                    terrain_idx=(state.core.terrain_idx
                                 if hasattr(state, "core")
                                 else state.terrain_idx))
        return (state, obs, key, done_seen, ret, length), snap

    @jax.jit
    def rollout(key):
        k_reset, k_run = jax.random.split(key)
        state, obs = env.reset(bank, k_reset)
        init = (state, obs, k_run, jnp.zeros(()), jnp.zeros(()),
                jnp.zeros((), jnp.int32))
        (_, _, _, done_seen, ret, length), snaps = jax.lax.scan(
            body, init, None, length=n_cap)
        return snaps, ret, length, done_seen

    snaps, ret, length, done_seen = rollout(key)
    return dict(snaps=jax.device_get(snaps), reward=float(ret),
                length=int(length), failed=bool(done_seen > 0))


def render_episode(env, bank, snaps: Dict, height: int = 240,
                   width: int = 320) -> np.ndarray:
    """Render captured snapshots to (T, H, W, 3) frames in one vmapped jit."""
    model = env.model
    tid = snaps["terrain_idx"][0]
    sampler = hf.make_sampler(bank.heights, jnp.asarray(tid),
                              model.hfield_half_extent, env.params.zscale)

    @jax.jit
    def render_all(base_pos, base_quat, ball_pos):
        def one(bp, q, ball):
            return render_scene(sampler, bp, q, ball,
                                height=height, width=width)
        return jax.vmap(one)(base_pos, base_quat, ball_pos)

    frames = render_all(jnp.asarray(snaps["base_pos"]),
                        jnp.asarray(snaps["base_quat"]),
                        jnp.asarray(snaps["ball_pos"]))
    return np.asarray(frames)


def visualize_episodes(env, bank, policy_fn, key, n_episodes: int,
                       max_steps: int, out_path: str, height: int = 240,
                       width: int = 320, fps: int = 30,
                       verbose: bool = True) -> str:
    """Run + render n episodes into one video file."""
    all_frames = []
    for i in range(n_episodes):
        key, k = jax.random.split(key)
        ep = run_episode(env, bank, policy_fn, k, max_steps)
        frames = render_episode(env, bank, ep["snaps"], height, width)
        n_live = max(1, -(-ep["length"] // 16))  # cut at episode end (+1 frame)
        all_frames.append(frames[:n_live + 1])
        if verbose:
            status = "FELL" if ep["failed"] else "ok"
            print(f"episode {i}: reward {ep['reward']:8.3f} "
                  f"length {ep['length']} [{status}]")
    out = save_video(np.concatenate(all_frames), out_path, fps=fps)
    if verbose:
        print(f"video -> {out}")
    return out
