"""`ballbot-browse-env`: interactive terrain/reward browser.

Counterpart of ballbot_rl/visualization/browse_environments.py:45-694 — a
terminal menu over the component registry that builds a config and launches
the env visualizer.
"""
from __future__ import annotations

import argparse
import sys

# curated parameter presets per terrain, loaded from the shared catalog
# (examples/terrain_examples.yaml; parameter names match the generators)
def _load_presets():
    import os

    import yaml

    cand = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "examples",
        "terrain_examples.yaml")
    if os.path.exists(cand):
        with open(cand) as f:
            raw = yaml.safe_load(f) or {}
        return {k: (v or {}).get("config", {}) for k, v in raw.items()}
    return {"perlin": {"scale": 25.0, "octaves": 4, "persistence": 0.2,
                       "lacunarity": 2.0}, "flat": {}}


TERRAIN_PRESETS = _load_presets()


def _menu(title, options):
    print(f"\n{title}")
    for i, o in enumerate(options):
        print(f"  [{i}] {o}")
    while True:
        raw = input("> ").strip()
        if raw.isdigit() and 0 <= int(raw) < len(options):
            return options[int(raw)]
        print(f"pick 0..{len(options) - 1}")


def _edit_params(params: dict) -> dict:
    if not params:
        return params
    print("parameters (enter to keep defaults):")
    out = {}
    for k, v in params.items():
        if isinstance(v, (list, dict)):
            out[k] = v
            continue
        raw = input(f"  {k} [{v}]: ").strip()
        if not raw:
            out[k] = v
        else:
            try:
                out[k] = type(v)(raw) if not isinstance(v, bool) \
                    else raw.lower() in ("1", "true", "y", "yes")
            except ValueError:
                out[k] = raw
    return out


def cli_main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Browse terrains/rewards "
                                            "interactively")
    p.add_argument("--episodes", type=int, default=1)
    p.add_argument("--out", default="outputs/videos/browse.mp4")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-steps", type=int, default=1000)
    args = p.parse_args(argv)

    import openballbot_rl_tpu  # noqa: F401 — registration side effect
    from openballbot_rl_tpu.core.registry import ComponentRegistry

    terrains = ComponentRegistry.list_terrains()
    rewards = ComponentRegistry.list_rewards()

    terrain = _menu("terrain:", terrains)
    t_params = _edit_params(dict(TERRAIN_PRESETS.get(terrain, {})))
    reward = _menu("reward:", rewards)
    r_params = {"target_direction": [0.0, 1.0]}
    if reward == "distance":
        r_params = {"goal_position": [2.0, 2.0]}
    policy = _menu("policy:", ["random", "zero"])

    config = {
        "problem": {
            "terrain": {"type": terrain, "config": t_params},
            "reward": {"type": reward, "config": r_params},
        },
        "env": {"max_ep_steps": args.max_steps},
    }
    print(f"\nlaunching visualizer: terrain={terrain} reward={reward} "
          f"policy={policy}")
    from openballbot_rl_tpu.cli.visualize_env import main as viz_main

    viz_main(config, n_episodes=args.episodes, policy=policy, out=args.out,
             seed=args.seed, max_steps=args.max_steps)
    return 0


if __name__ == "__main__":
    sys.exit(cli_main())
