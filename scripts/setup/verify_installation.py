#!/usr/bin/env python
"""Installation verification.

Counterpart of reference scripts/setup/verify_installation.py:5-65: imports,
component registration, CLI resolution, and a one-step env smoke test.
"""
from __future__ import annotations

import shutil
import sys


def main() -> int:
    failures = []

    # 1. imports + component registration (import side effect)
    try:
        from openballbot_rl_tpu.utils.devices import force_cpu
        force_cpu()
        import openballbot_rl_tpu  # noqa: F401
        from openballbot_rl_tpu.core.registry import ComponentRegistry

        terrains = ComponentRegistry.list_terrains()
        rewards = ComponentRegistry.list_rewards()
        assert len(terrains) >= 13, f"only {len(terrains)} terrains registered"
        assert "directional" in rewards and "distance" in rewards
        print(f"[ok] package imports; {len(terrains)} terrains, "
              f"{len(rewards)} rewards registered")
    except Exception as e:  # noqa: BLE001
        failures.append(f"imports/registration: {e}")

    # 2. console scripts on PATH
    for cli in ("ballbot-train", "ballbot-eval", "ballbot-collect",
                "ballbot-pretrain", "ballbot-visualize-env",
                "ballbot-visualize-model", "ballbot-plot-training",
                "ballbot-browse-env"):
        if shutil.which(cli) is None:
            failures.append(f"console script missing: {cli}")
    if not failures:
        print("[ok] all 8 console scripts resolve")

    # 3. env smoke test: reset + one step
    try:
        import jax
        import jax.numpy as jnp

        from openballbot_rl_tpu.envs import BallbotEnv, EnvParams, TerrainBank

        env = BallbotEnv(EnvParams())
        n = env.model.hfield_n
        bank = TerrainBank(heights=jnp.zeros((1, n, n)),
                           spawn_offsets=jnp.full((1,), 0.01),
                           seeds=jnp.zeros((1,), jnp.int32))
        s, obs = env.reset(bank, jax.random.PRNGKey(0))
        s, obs, r, d, info = env.step(bank, s, jnp.zeros(3))
        assert set(obs) == {"orientation", "angular_vel", "vel",
                            "motor_state", "actions"}
        print(f"[ok] env reset+step (reward {float(r):+.4f})")
    except Exception as e:  # noqa: BLE001
        failures.append(f"env smoke test: {e}")

    if failures:
        for f in failures:
            print(f"[FAIL] {f}")
        return 1
    print("ALL CHECKS PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
