"""Cross-evaluate the REFERENCE's own trained SB3 policies in THIS env.

The reference repo ships trained checkpoints (torch state dicts inside SB3
best_model.zip):

  * legacy_salehi-2025-original — the PAPER author's original policy
    (Readme.md:5 "original model provided by Salehi in the research paper");
  * 2025-12-0x_ppo-{flat,perlin}-directional-seed10 — the repo owner's runs
    on the snapshot's exact terrain distribution, with recorded eval scores
    (flat: final 9.20, ep-len 378; perlin: final 2.53-3.89, best mean 12.75).

Running those weights in OUR env answers two round-3 questions at once:

  1. ENGINE PARITY: if the author's perlin-trained model scores in our env
     about what their own evaluations.npz recorded, the two environments
     agree behaviorally on-distribution — policy-level evidence on top of
     the state-matched oracle bounds.
  2. TERRAIN FEASIBILITY: if even the PAPER's winning policy cannot survive
     the snapshot's full-amplitude perlin here, the paper's ~86/4000-step
     result was not obtained on this terrain distribution — pinning the
     reproduction gap to the task spec, not our training stack.

The policy network is rebuilt from the reference's architecture
(mlp_policy.py:25-51 extractor; train.py:38-47 LeakyReLU 4x128 heads;
observation_spaces.py:28-57 key set — SB3 Dict spaces iterate keys
alphabetically, fixing the 56-dim concat order) and loaded with the zip's
policy.pth weights. Deterministic action = action_net(mlp(features)),
clipped to [-1, 1] (SB3 predict(deterministic=True) clips to the space).

Run CPU-only (TPU fine too):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tools/cross_eval_reference_policies.py \
      --model legacy --terrain perlin --amplitude 1.0 --episodes 8
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from openballbot_rl_tpu.utils.devices import force_cpu  # noqa: E402

if __name__ == "__main__" and os.environ.get("JAX_PLATFORMS", "") == "cpu":
    force_cpu()

ARCHIVE = "/root/reference/outputs/experiments/archived_models"
MODELS = {
    "legacy": f"{ARCHIVE}/legacy_salehi-2025-original/best_model.zip",
    "flat10M": f"{ARCHIVE}/2025-12-04_ppo-flat-directional-seed10/best_model.zip",
    "perlin5M": f"{ARCHIVE}/2025-12-03_ppo-perlin-directional-5.2M-steps/best_model.zip",
    "perlin10M": f"{ARCHIVE}/2025-12-04_ppo-perlin-directional-seed10/best_model.zip",
}
# alphabetical gym.spaces.Dict order — the 56-dim concat layout
KEY_ORDER = ("actions", "angular_vel", "motor_state", "orientation",
             "relative_image_timestamp", "rgbd_0", "rgbd_1", "vel")


def load_reference_policy(zip_path: str):
    """Rebuild the reference's SB3 MultiInputPolicy from its state dict."""
    import torch

    with zipfile.ZipFile(zip_path) as z:
        raw = z.read("policy.pth")
    sd = torch.load(io.BytesIO(raw), map_location="cpu", weights_only=True)

    def make_encoder():
        return torch.nn.Sequential(
            torch.nn.Conv2d(1, 32, 3, stride=2, padding=1),
            torch.nn.BatchNorm2d(32), torch.nn.LeakyReLU(),
            torch.nn.Conv2d(32, 32, 3, stride=2, padding=1),
            torch.nn.BatchNorm2d(32), torch.nn.LeakyReLU(0.01),
            torch.nn.Flatten(), torch.nn.Linear(8192, 20),
            torch.nn.BatchNorm1d(20), torch.nn.Tanh())

    enc = {k: make_encoder() for k in ("rgbd_0", "rgbd_1")}
    mlp = torch.nn.Sequential(
        torch.nn.Linear(56, 128), torch.nn.LeakyReLU(),
        torch.nn.Linear(128, 128), torch.nn.LeakyReLU(),
        torch.nn.Linear(128, 128), torch.nn.LeakyReLU(),
        torch.nn.Linear(128, 128), torch.nn.LeakyReLU())
    action_net = torch.nn.Linear(128, 3)

    def take(prefix, module):
        sub = {k[len(prefix):]: v for k, v in sd.items()
               if k.startswith(prefix)}
        module.load_state_dict(sub)

    # pi_features_extractor is the actor's copy (share_features false in SB3
    # MultiInputActorCriticPolicy when extractor classes differ; the zips
    # carry identical weights under all three prefixes)
    take("pi_features_extractor.extractors.rgbd_0.", enc["rgbd_0"])
    take("pi_features_extractor.extractors.rgbd_1.", enc["rgbd_1"])
    take("mlp_extractor.policy_net.", mlp)
    take("action_net.", action_net)
    for m in list(enc.values()) + [mlp, action_net]:
        m.eval()

    @torch.no_grad()
    def act(obs_np: dict) -> np.ndarray:
        feats = []
        for k in KEY_ORDER:
            t = torch.as_tensor(np.asarray(obs_np[k]), dtype=torch.float32)
            if k in enc:
                feats.append(enc[k](t))
            else:
                feats.append(t.reshape(t.shape[0], -1))
        x = torch.cat(feats, dim=1)
        return np.clip(action_net(mlp(x)).numpy(), -1.0, 1.0)

    return act


def make_env(terrain: str, amplitude: float):
    from openballbot_rl_tpu.envs import make_env_from_config

    tcfg = ({"type": "flat", "config": {}} if terrain == "flat" else
            {"type": "perlin", "config": {
                "scale": 25.0, "octaves": 4, "persistence": 0.2,
                "lacunarity": 2.0, "amplitude": amplitude}})
    cfg = {
        "problem": {
            "terrain": tcfg,
            "reward": {"type": "directional",
                       "config": {"target_direction": [0.0, 1.0]}},
        },
        "env": {"max_ep_steps": 4000, "max_allowed_tilt": 20.0},
        "camera": {"enabled": True, "height": 64, "width": 64,
                   "frame_rate": 90, "disable_rgb": True},
    }
    return make_env_from_config(cfg)


def evaluate(model: str, terrain: str, amplitude: float, episodes: int,
             horizon: int, seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp

    act = load_reference_policy(MODELS[model])
    env, terrain_gen = make_env(terrain, amplitude)

    from openballbot_rl_tpu.envs import make_terrain_bank
    bank = make_terrain_bank(terrain_gen, env.model.hfield_n,
                             env.params.zscale, jax.random.PRNGKey(seed),
                             max(episodes, 8))

    B = episodes
    reset = jax.jit(env.batch_reset)
    step = jax.jit(env.batch_step)
    states, obs = reset(bank, jax.random.split(jax.random.PRNGKey(seed), B))

    returns = np.zeros(B)
    lengths = np.zeros(B, np.int64)
    alive = np.ones(B, bool)
    for t in range(horizon):
        actions = act({k: np.asarray(v) for k, v in obs.items()})
        states, obs, reward, done, _ = step(bank, states,
                                            jnp.asarray(actions))
        r = np.asarray(reward)
        d = np.asarray(done)
        returns[alive] += r[alive]
        lengths[alive] += 1
        alive &= ~d
        if not alive.any():
            break

    return dict(model=model, terrain=terrain, amplitude=amplitude,
                episodes=B, horizon=horizon,
                mean_reward=float(returns.mean()),
                std_reward=float(returns.std()),
                mean_ep_len=float(lengths.mean()),
                max_ep_len=int(lengths.max()),
                survival=int((lengths >= horizon).sum()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="legacy", choices=sorted(MODELS))
    ap.add_argument("--terrain", default="perlin",
                    choices=["perlin", "flat"])
    ap.add_argument("--amplitude", type=float, default=1.0)
    ap.add_argument("--episodes", type=int, default=8)
    ap.add_argument("--horizon", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    out = evaluate(args.model, args.terrain, args.amplitude, args.episodes,
                   args.horizon, args.seed)
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
