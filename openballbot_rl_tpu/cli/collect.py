"""`ballbot-collect`: harvest depth frames for encoder pretraining.

Counterpart of ballbot_rl/data/collect.py:18-68 (SubprocVecEnv with PNG
logging driven by a trained PPO policy). Here: batched vision env on device,
frames pulled at camera ticks, written as one npz (+ optional PNG tree for
interop with reference tooling).
"""
from __future__ import annotations

import argparse
import sys


def main(config, n_frames: int, out: str, model: str = "", batch: int = 64,
         seed: int = 0, export_png: str = "", verbose: bool = True) -> str:
    import jax

    from openballbot_rl_tpu.data.collect import (
        collect_depth_frames, export_png_tree, save_frames_npz)
    from openballbot_rl_tpu.envs import make_env_from_config, make_terrain_bank
    from openballbot_rl_tpu.envs.vision import VisionBallbotEnv

    config = dict(config)
    config.setdefault("camera", {})
    config["camera"] = {**config["camera"], "enabled": True}
    config["frozen_cnn"] = ""        # need raw images, not latents
    env, terrain_gen = make_env_from_config(config)
    assert isinstance(env, VisionBallbotEnv)

    key = jax.random.PRNGKey(seed)
    key, k_bank = jax.random.split(key)
    bank = make_terrain_bank(terrain_gen, env.model.hfield_n,
                             env.params.zscale, k_bank,
                             int(config.get("terrain_bank_size", 16)),
                             half_extent=float(env.model.hfield_half_extent))

    policy_fn = None
    if model:
        from openballbot_rl_tpu.nn.networks import build_policy_network
        from openballbot_rl_tpu.utils.checkpoint import load_params_raw

        params = load_params_raw(model)
        net = build_policy_network(config)

        def policy_fn(obs, k):
            mean, _, _ = net.apply(params, obs)
            return jax.numpy.clip(mean, -1.0, 1.0)

    frames = collect_depth_frames(env, bank, key, n_frames,
                                  policy_fn=policy_fn, batch=batch,
                                  verbose=verbose)
    save_frames_npz(out, frames)
    if export_png:
        n = export_png_tree(export_png, frames)
        if verbose:
            print(f"exported {n} PNGs under {export_png}")
    if verbose:
        print(f"saved {frames.shape} -> {out}")
    return out


def cli_main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Collect depth frames (TPU-native)")
    p.add_argument("--config", required=True, help="env or training YAML")
    p.add_argument("--n-frames", type=int, default=20000)
    p.add_argument("--out", default="outputs/datasets/depth_frames.npz")
    p.add_argument("--model", default="", help="checkpoint for the driving policy"
                                               " (default: random actions)")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--export-png", default="", help="also dump a reference-style"
                                                    " PNG tree here")
    args = p.parse_args(argv)

    from openballbot_rl_tpu.core.config import load_config

    cfg = load_config(args.config)
    if "env_config" in cfg:     # a training config: resolve the env config
        from openballbot_rl_tpu.core.config import load_training_config
        cfg = load_training_config(args.config)
    main(cfg, args.n_frames, args.out, model=args.model, batch=args.batch,
         seed=args.seed, export_png=args.export_png)
    return 0


if __name__ == "__main__":
    sys.exit(cli_main())
