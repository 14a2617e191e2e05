#!/bin/bash
# Round-5 follow-up chain (run after r5_training_chain.sh frees the chip):
#   1. Large-N re-eval of the anneal study's best vs final checkpoints
#      (64 episodes instead of 16) — quantifies how much of the post-peak
#      "decay" is real policy drift vs 16-episode bimodal eval noise.
#   2. ent_coef=0 probe, 2 seeds: the anneal run PROVED the decay is
#      LR-insensitive (eval curves near-identical to fixed-LR at 6x lower
#      LR); the remaining mover in the training stats is entropy/sigma
#      creep (ent 5.12 -> 5.27 over the post-curriculum phase) driven by
#      the entropy bonus on failure-dominated amp-0.25 data.
# Launch: setsid nohup tools/run_on_tpu.sh /tmp/r5_chain2.log \
#             bash tools/r5_chain2.sh &
set -u
cd "$(dirname "$0")/.."

echo "[chain2] 1/2 large-N re-eval of anneal best/final (64 ep)"
python - <<'EOF'
import json, os, sys
sys.path.insert(0, ".")
import jax
from openballbot_rl_tpu.core.config import load_training_config
from openballbot_rl_tpu.envs import make_env_from_config, make_terrain_bank
from openballbot_rl_tpu.eval.evaluate import evaluate_policy
from openballbot_rl_tpu.nn.networks import build_policy_network
from openballbot_rl_tpu.utils.checkpoint import load_params_raw

root = "outputs/experiments/seed_studies/perlin-cur025-anneal-r5"
out = {}
for s in (0, 1):
    run_dir = f"{root}/seed{s}"
    import yaml
    with open(f"{run_dir}/config.yaml") as f:
        config = yaml.safe_load(f)
    # eval at the curriculum END amplitude, like the in-run evals
    config["problem"]["terrain"]["config"]["amplitude"] = 0.25
    env, gen = make_env_from_config(config)
    net = build_policy_network(config)
    k_bank, k_eval = jax.random.split(jax.random.PRNGKey(123 + s))
    bank = make_terrain_bank(gen, env.model.hfield_n, env.params.zscale,
                             k_bank, 64,
                             half_extent=float(env.model.hfield_half_extent))
    for ck in ("best_model", "final_model"):
        params = load_params_raw(f"{run_dir}/{ck}")
        res = evaluate_policy(env, net.apply, params, bank, k_eval,
                              n_episodes=64,
                              max_steps=env.params.max_ep_steps,
                              verbose=False)
        res = {k: float(v) if hasattr(v, "item") else v
               for k, v in res.items()}
        out[f"seed{s}/{ck}"] = res
        print(f"[chain2] seed{s} {ck}: {res}", flush=True)
with open(f"{root}/reeval_64ep.json", "w") as f:
    json.dump(out, f, indent=2)
print("[chain2] wrote", f"{root}/reeval_64ep.json")
EOF
rc1=$?
echo "[chain2] re-eval rc=$rc1; settling relay"
sleep 60

echo "[chain2] 2/2 ent_coef=0 probe (2 seeds)"
python scripts/utils/seed_study.py \
    --config configs/train/ppo_perlin_curriculum.yaml \
    --set algo.ent_coef=0.0 \
    --seeds 0,1 --tag perlin-cur025-ent0-r5
echo "[chain2] done rc=$?"
