"""`ballbot-visualize-env`: watch the env under random/zero actions.

Counterpart of ballbot_rl/visualization/visualize_env.py:36-227 — the GUI
viewer becomes an offline raytraced video.
"""
from __future__ import annotations

import argparse
import sys


def main(config: dict, n_episodes: int = 2, policy: str = "random",
         out: str = "outputs/videos/env.mp4", seed: int = 0,
         max_steps: int = 0, verbose: bool = True) -> str:
    import jax
    import jax.numpy as jnp

    from openballbot_rl_tpu.envs import make_env_from_config, make_terrain_bank
    from openballbot_rl_tpu.viz.rollout import visualize_episodes

    env, terrain_gen = make_env_from_config(config)
    key = jax.random.PRNGKey(seed)
    key, k_bank = jax.random.split(key)
    terrain_cfg = (config.get("problem", {}) or {}).get("terrain", {})
    fixed_seed = (terrain_cfg.get("config", {}) or {}).get("seed")
    bank = make_terrain_bank(terrain_gen, env.model.hfield_n,
                             env.params.zscale, k_bank, 8,
                             fixed_seed=fixed_seed,
                             half_extent=float(env.model.hfield_half_extent))

    policy_fn = None
    if policy == "zero":
        policy_fn = lambda obs, k: jnp.zeros(3)
    return visualize_episodes(
        env, bank, policy_fn, key, n_episodes,
        max_steps or env.params.max_ep_steps, out, verbose=verbose)


def cli_main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Visualize env rollouts")
    p.add_argument("--config", required=True, help="env or training YAML")
    p.add_argument("--episodes", type=int, default=2)
    p.add_argument("--policy", choices=["random", "zero"], default="random")
    p.add_argument("--out", default="outputs/videos/env.mp4")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-steps", type=int, default=0)
    args = p.parse_args(argv)

    from openballbot_rl_tpu.core.config import load_config, load_training_config

    cfg = load_config(args.config)
    if "env_config" in cfg:
        cfg = load_training_config(args.config)
    main(cfg, n_episodes=args.episodes, policy=args.policy, out=args.out,
         seed=args.seed, max_steps=args.max_steps)
    return 0


if __name__ == "__main__":
    sys.exit(cli_main())
