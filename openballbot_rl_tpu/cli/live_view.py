"""`ballbot-live`: interactive live view of a policy rolling out.

Covers the reference's GUI debugging capability (the on-screen MuJoCo
viewer, ballbot_env.py:347-357 / visualize_model.py:30-370) on headless TPU
hosts: episodes run on device in short chunks, each chunk's frame is
raytraced (viz/scene.py) and pushed to a browser MJPEG stream
(viz/live.py LiveViewer), with optional ANSI rendering straight into the
terminal. Ctrl-C stops cleanly, like the reference's viewer loop.

    ballbot-live --model outputs/.../best_model            # browser view
    ballbot-live --model ... --ansi                        # terminal view
    ballbot-live --config configs/train/ppo_perlin_tpu.yaml  # random policy
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time


def main(model_path: str = "", config=None, terrain: str = "",
         port: int = 8765, fps: float = 30.0, height: int = 240,
         width: int = 320, episodes: int = 0, ansi: bool = False,
         seed: int = 0, verbose: bool = True,
         max_seconds: float = 0.0, host: str = "127.0.0.1") -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from openballbot_rl_tpu.envs import make_env_from_config, make_terrain_bank
    from openballbot_rl_tpu.physics import hfield as hf
    from openballbot_rl_tpu.viz.live import LiveViewer, ansi_frame
    from openballbot_rl_tpu.viz.scene import render_scene

    # config/model resolution mirrors ballbot-visualize-model
    if config is None and model_path:
        for cand in (os.path.join(os.path.dirname(os.path.abspath(model_path)),
                                  "config.yaml"),
                     os.path.join(os.path.dirname(os.path.dirname(
                         os.path.abspath(model_path))), "config.yaml")):
            if os.path.exists(cand):
                with open(cand) as f:
                    config = yaml.safe_load(f)
                break
    if config is None:
        config = {"problem": {
            "terrain": {"type": terrain or "perlin", "config": {}},
            "reward": {"type": "directional",
                       "config": {"target_direction": [0.0, 1.0]}}}}
    if terrain:
        config.setdefault("problem", {})
        config["problem"]["terrain"] = {"type": terrain, "config": {}}

    env, terrain_gen = make_env_from_config(config)

    policy_fn = None
    if model_path:
        from openballbot_rl_tpu.nn.networks import (SquashedGaussianActor,
                                                    build_policy_network)
        from openballbot_rl_tpu.utils.checkpoint import load_params_raw

        params = load_params_raw(model_path)
        if isinstance(params, dict) and "actor" in params and "critic" in params:
            sac = SquashedGaussianActor()

            def policy_fn(obs, k):
                mean, _ = sac.apply(params["actor"], obs)
                return jnp.tanh(mean)
        else:
            net = build_policy_network(config)

            def policy_fn(obs, k):
                mean, _, _ = net.apply(params, obs)
                return jnp.clip(mean, -1.0, 1.0)

    key = jax.random.PRNGKey(seed)
    key, k_bank = jax.random.split(key)
    bank = make_terrain_bank(terrain_gen, env.model.hfield_n,
                             env.params.zscale, k_bank, 8,
                             half_extent=float(env.model.hfield_half_extent))

    # 500 Hz sim / fps frames -> control steps per displayed frame
    chunk = max(1, int(round(500.0 / fps)))

    @jax.jit
    def reset(k):
        return env.reset(bank, k)

    @functools.partial(jax.jit, static_argnums=())
    def advance(state, obs, k):
        def f(carry, _):
            state, obs, k, ret = carry
            k, ka = jax.random.split(k)
            if policy_fn is None:
                a = jax.random.uniform(ka, (3,), minval=-1.0, maxval=1.0)
            else:
                a = policy_fn(obs, ka)
            state, obs, r, done, _ = env.step(bank, state, a)
            return (state, obs, k, ret + r), done
        (state, obs, k, ret), dones = jax.lax.scan(
            f, (state, obs, k, 0.0), None, length=chunk)
        return state, obs, k, ret, dones.any()

    @jax.jit
    def frame_of(state):
        phys = state.core.phys if hasattr(state, "core") else state.phys
        tid = (state.core.terrain_idx if hasattr(state, "core")
               else state.terrain_idx)
        sampler = hf.make_sampler(bank.heights, tid,
                                  env.model.hfield_half_extent,
                                  env.params.zscale)
        return render_scene(sampler, phys.base_pos, phys.base_quat,
                            phys.ball_pos, height=height, width=width)

    @jax.jit
    def perturb(state, k):
        """Kick the base angular velocity (interactive disturbance-rejection
        probe — the closest counterpart of shoving the robot in a GUI)."""
        kick = jax.random.uniform(k, (3,), minval=-0.4, maxval=0.4)
        if hasattr(state, "core"):
            phys = state.core.phys
            return state.replace(core=state.core.replace(
                phys=phys.replace(base_angvel=phys.base_angvel + kick)))
        return state.replace(phys=state.phys.replace(
            base_angvel=state.phys.base_angvel + kick))

    viewer = None
    stdin_keys = None
    if not ansi:
        viewer = LiveViewer(host=host, port=port)
        if verbose:
            print(f"live view: http://localhost:{viewer.port}  (Ctrl-C "
                  "stops; in-page keys: space=pause r=reset p=perturb "
                  "q=quit)")
    elif sys.stdin.isatty():
        stdin_keys = _RawStdin()

    def pending_commands():
        cmds = viewer.poll_commands() if viewer is not None else []
        if stdin_keys is not None:
            cmds += stdin_keys.poll()
        return cmds

    ep = 0
    t_start = time.time()
    paused = False
    quit_now = False
    try:
        while not quit_now and (episodes <= 0 or ep < episodes):
            key, k = jax.random.split(key)
            state, obs = reset(k)
            ret, steps, done = 0.0, 0, False
            while not done and steps < env.params.max_ep_steps:
                t0 = time.time()
                for c in pending_commands():
                    if c == " ":
                        paused = not paused
                    elif c == "r":            # reset mid-episode, like the
                        done = True           # reference viewer's reset
                    elif c == "p":
                        key, kp = jax.random.split(key)
                        state = perturb(state, kp)
                    elif c == "q":
                        quit_now = True
                if done or quit_now:
                    break
                if not paused:
                    state, obs, key, r, done_flag = advance(state, obs, key)
                    ret += float(r)
                    steps += chunk
                    done = bool(done_flag)
                frame = np.asarray(frame_of(state))
                tele = (f"episode {ep}  t={steps / 500.0:6.2f}s  "
                        f"return {ret:+8.3f}"
                        + ("  [PAUSED]" if paused else ""))
                if ansi:
                    sys.stdout.write("\x1b[H\x1b[2J" + ansi_frame(frame)
                                     + "\n" + tele + "\r\n")
                    sys.stdout.flush()
                else:
                    viewer.push(frame, tele)
                # pace to wall-clock fps (sim runs far faster than realtime)
                dt = time.time() - t0
                if dt < 1.0 / fps:
                    time.sleep(1.0 / fps - dt)
                if max_seconds and time.time() - t_start > max_seconds:
                    raise KeyboardInterrupt
            if verbose and not ansi:
                print(f"episode {ep}: return {ret:+.3f} steps {steps} "
                      f"{'FELL' if done else 'ok'}")
            ep += 1
    except KeyboardInterrupt:
        if verbose:
            print("\nstopped")
    finally:
        if viewer is not None:
            viewer.close()
        if stdin_keys is not None:
            stdin_keys.restore()
    return 0


class _RawStdin:
    """Nonblocking single-key reads for the ANSI terminal view (space/r/p/q
    work there too). Restores the tty on exit."""

    def __init__(self):
        import termios
        import tty

        self._fd = sys.stdin.fileno()
        self._saved = termios.tcgetattr(self._fd)
        tty.setcbreak(self._fd)

    def poll(self) -> list:
        import select

        keys = []
        while select.select([sys.stdin], [], [], 0)[0]:
            keys.append(sys.stdin.read(1))
        return keys

    def restore(self) -> None:
        import termios

        termios.tcsetattr(self._fd, termios.TCSADRAIN, self._saved)


def cli_main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Live policy viewer (MJPEG/ANSI)")
    p.add_argument("--model", default="", help="checkpoint path (empty = random policy)")
    p.add_argument("--config", default="", help="config yaml (default: next to model)")
    p.add_argument("--terrain", default="", help="terrain type override")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address (use 0.0.0.0 to expose the stream "
                        "on all interfaces — it is unauthenticated)")
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--episodes", type=int, default=0, help="0 = loop forever")
    p.add_argument("--ansi", action="store_true", help="render in terminal")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-seconds", type=float, default=0.0)
    args = p.parse_args(argv)

    config = None
    if args.config:
        from openballbot_rl_tpu.core.config import load_training_config

        try:
            config = load_training_config(args.config)
        except Exception:
            import yaml

            with open(args.config) as f:
                config = yaml.safe_load(f)
    return main(args.model, config, args.terrain, args.port, args.fps,
                args.height, args.width, args.episodes, args.ansi,
                args.seed, max_seconds=args.max_seconds, host=args.host)


if __name__ == "__main__":
    sys.exit(cli_main())
