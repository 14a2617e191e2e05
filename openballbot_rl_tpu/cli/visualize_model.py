"""`ballbot-visualize-model`: watch a trained model act.

Counterpart of ballbot_rl/visualization/visualize_model.py:30-370 (loads the
model, auto-finds config.yaml next to it, deterministic episodes in a GUI) —
rendered offline via the scene raytracer.
"""
from __future__ import annotations

import argparse
import os
import sys


def main(model_path: str, config: dict = None, n_episodes: int = 2,
         out: str = "", seed: int = 0, terrain: str = "",
         verbose: bool = True) -> str:
    import jax
    import jax.numpy as jnp
    import yaml

    from openballbot_rl_tpu.envs import make_env_from_config, make_terrain_bank
    from openballbot_rl_tpu.nn.networks import build_policy_network
    from openballbot_rl_tpu.utils.checkpoint import load_params_raw
    from openballbot_rl_tpu.viz.rollout import visualize_episodes

    # auto-find run config next to the model (visualize_model.py:107-150)
    if config is None:
        for cand in (os.path.join(os.path.dirname(os.path.abspath(model_path)),
                                  "config.yaml"),
                     os.path.join(os.path.dirname(os.path.dirname(
                         os.path.abspath(model_path))), "config.yaml")):
            if os.path.exists(cand):
                with open(cand) as f:
                    config = yaml.safe_load(f)
                if verbose:
                    print(f"using run config {cand}")
                break
        else:
            raise SystemExit("no config.yaml found next to the model; "
                             "pass --config")
    if terrain:
        config.setdefault("problem", {})
        config["problem"]["terrain"] = {"type": terrain, "config": {}}

    env, terrain_gen = make_env_from_config(config)
    params = load_params_raw(model_path)
    if isinstance(params, dict) and "actor" in params and "critic" in params:
        # SAC checkpoint (same auto-detect as ballbot-eval)
        from openballbot_rl_tpu.nn.networks import SquashedGaussianActor

        sac_actor = SquashedGaussianActor()

        def policy_fn(obs, k):
            mean, _ = sac_actor.apply(params["actor"], obs)
            return jnp.tanh(mean)
    else:
        net = build_policy_network(config)

        def policy_fn(obs, k):
            mean, _, _ = net.apply(params, obs)
            return jnp.clip(mean, -1.0, 1.0)

    key = jax.random.PRNGKey(seed)
    key, k_bank = jax.random.split(key)
    terrain_cfg = (config.get("problem", {}) or {}).get("terrain", {})
    fixed_seed = (terrain_cfg.get("config", {}) or {}).get("seed")
    bank = make_terrain_bank(terrain_gen, env.model.hfield_n,
                             env.params.zscale, k_bank, 8,
                             fixed_seed=fixed_seed,
                             half_extent=float(env.model.hfield_half_extent))
    out = out or os.path.join(os.path.dirname(os.path.abspath(model_path)),
                              "visualization.mp4")
    return visualize_episodes(env, bank, policy_fn, key, n_episodes,
                              env.params.max_ep_steps, out, verbose=verbose)


def cli_main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Visualize a trained model")
    p.add_argument("--model", required=True)
    p.add_argument("--config", default="")
    p.add_argument("--episodes", type=int, default=2)
    p.add_argument("--terrain", default="", help="terrain type override")
    p.add_argument("--out", default="")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    config = None
    if args.config:
        from openballbot_rl_tpu.core.config import load_config, load_training_config
        config = load_config(args.config)
        if "env_config" in config:
            config = load_training_config(args.config)
    main(args.model, config, n_episodes=args.episodes, out=args.out,
         seed=args.seed, terrain=args.terrain)
    return 0


if __name__ == "__main__":
    sys.exit(cli_main())
