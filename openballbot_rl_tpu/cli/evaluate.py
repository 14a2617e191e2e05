"""`ballbot-eval`: evaluate a trained model.

Counterpart of ballbot_rl/evaluation/evaluate.py:172-229. Terrain resolution
priority matches the reference (:51-76): CLI override > eval config >
the terrain recorded in the run's config.yaml (the analogue of the
`model.terrain_type` attribute SB3 pickles into the zip).
"""
from __future__ import annotations

import argparse
import os
import sys


def resolve_eval_config(eval_config: dict, run_cfg: dict,
                        terrain: str = "") -> dict:
    """Merge an eval config over a run's config.yaml.

    Terrain/reward priority matches the reference (evaluate.py:51-76):
    CLI terrain override > eval config > run config. The run config stores
    its components under problem.* and get_component_config prefers
    problem.* over top level (core/config.py:72-74), so eval-config
    components must be lifted into problem.* or they would silently lose
    to the run's entries.
    """
    config = dict(eval_config or {})
    merged = dict(run_cfg or {})
    merged.update({k: v for k, v in config.items() if v})
    for comp in ("terrain", "reward"):
        override = (config.get("problem", {}) or {}).get(comp) \
            or config.get(comp)
        if override:
            merged["problem"] = dict(merged.get("problem") or {})
            merged["problem"][comp] = override
    if terrain:
        merged["problem"] = dict(merged.get("problem") or {})
        merged["problem"]["terrain"] = {"type": terrain, "config": {}}
    return merged


def main(model_path: str, eval_config: dict, terrain: str = "",
         n_test: int = 10, seed: int = 0, verbose: bool = True,
         log_dir: str = "") -> dict:
    import jax
    import yaml

    from openballbot_rl_tpu.envs import make_env_from_config, make_terrain_bank
    from openballbot_rl_tpu.eval.evaluate import evaluate_policy
    from openballbot_rl_tpu.nn.networks import build_policy_network
    from openballbot_rl_tpu.utils.checkpoint import load_params_raw

    # terrain priority: CLI > eval config > run config next to the model
    run_cfg = {}
    run_cfg_path = os.path.join(os.path.dirname(os.path.abspath(model_path)),
                                "config.yaml")
    if not os.path.exists(run_cfg_path):
        run_cfg_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(model_path))),
            "config.yaml")
    if os.path.exists(run_cfg_path):
        with open(run_cfg_path) as f:
            run_cfg = yaml.safe_load(f) or {}
        if verbose:
            print(f"using run config {run_cfg_path}")
    config = resolve_eval_config(eval_config, run_cfg, terrain=terrain)

    env, terrain_gen = make_env_from_config(config)
    params = load_params_raw(model_path)
    # PPO-vs-SAC auto-detect like the reference's PPO.load -> SAC.load
    # fallback (evaluate.py:25-48): a SAC checkpoint's params tree carries
    # the actor/critic/target/log_alpha split
    is_sac = isinstance(params, dict) and "actor" in params \
        and "critic" in params
    if is_sac:
        import jax.numpy as jnp

        from openballbot_rl_tpu.nn.networks import SquashedGaussianActor

        sac_actor = SquashedGaussianActor()

        def apply_fn(p, obs):
            mean, _ = sac_actor.apply(p["actor"], obs)
            # evaluate_policy clips the returned mean to [-1,1]; tanh keeps
            # SAC's native squashed deterministic action inside that box
            return jnp.tanh(mean), None, None

        if verbose:
            print("detected SAC checkpoint")
        net_apply = apply_fn
    else:
        # built from the run config's policy section (same path as training)
        net_apply = build_policy_network(config).apply

    key = jax.random.PRNGKey(seed)
    k_bank, k_eval = jax.random.split(key)
    terrain_cfg = (config.get("problem", {}) or {}).get("terrain", {})
    fixed_seed = (terrain_cfg.get("config", {}) or {}).get("seed")
    bank = make_terrain_bank(terrain_gen, env.model.hfield_n,
                             env.params.zscale, k_bank,
                             max(n_test, 8), fixed_seed=fixed_seed,
                             half_extent=float(env.model.hfield_half_extent))
    res = evaluate_policy(env, net_apply, params, bank, k_eval,
                          n_episodes=n_test,
                          max_steps=env.params.max_ep_steps,
                          verbose=verbose)
    if log_dir:
        # reference-layout per-episode logs (utils/episode_log.py)
        import jax.numpy as jnp

        from openballbot_rl_tpu.utils.episode_log import log_episode_rollout

        def policy_fn(obs, k):
            mean, _, _ = net_apply(params, obs)
            return jnp.clip(mean, -1.0, 1.0)

        k_log = jax.random.PRNGKey(seed + 1)
        for e in range(n_test):
            k_log, k = jax.random.split(k_log)
            info = log_episode_rollout(env, bank, policy_fn, k,
                                       env.params.max_ep_steps, log_dir, e)
            if verbose:
                print(f"logged episode {e}: len {info['length']} "
                      f"seed {info['terrain_seed']} -> {log_dir}")
    return res


def cli_main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Evaluate a trained ballbot model")
    p.add_argument("--model", required=True, help="checkpoint dir (best_model/"
                                                  "final_model/checkpoints/*)")
    p.add_argument("--config", default="", help="eval YAML (default: "
                                                "configs/eval/default.yaml)")
    p.add_argument("--terrain", default="", help="terrain type override")
    p.add_argument("--n-test", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-dir", default="", help="dump reference-layout "
                   "per-episode logs (rewards, terrain seeds, depth PNGs)")
    args = p.parse_args(argv)

    from openballbot_rl_tpu.core.config import load_config

    eval_cfg = {}
    cfg_path = args.config or "configs/eval/default.yaml"
    if os.path.exists(cfg_path):
        eval_cfg = load_config(cfg_path)
    elif args.config:
        print(f"eval config not found: {args.config}", file=sys.stderr)
        return 2
    main(args.model, eval_cfg, terrain=args.terrain, n_test=args.n_test,
         seed=args.seed, log_dir=args.log_dir)
    return 0


if __name__ == "__main__":
    sys.exit(cli_main())
