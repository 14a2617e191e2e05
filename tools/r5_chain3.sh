#!/bin/bash
# Round-5 chain 3 (final-session chip schedule):
#   1. Large-N (64-episode) re-eval of the anneal study's best vs final
#      checkpoints — quantifies how much of the post-peak "decay" is real
#      policy drift vs 16-episode bimodal eval noise (chain2 step 1,
#      never ran: the previous session ended first).
#   2. SAC + curriculum study, 3 seeds (VERDICT r4 #5). 14M steps with
#      the curriculum schedule matched in ABSOLUTE steps to the shipped
#      20M config (anneal ends at 8M either way: 0.4*20M = 0.5714286*14M),
#      so three full seeds fit the session's chip budget. The interrupted
#      20M seed0 (committed) reached eval 57.3 at 6M mid-curriculum.
# Launch: setsid nohup tools/run_on_tpu.sh /tmp/r5_chain3.log \
#             bash tools/r5_chain3.sh &
set -u
cd "$(dirname "$0")/.."

echo "[chain3] 1/2 large-N re-eval of anneal best/final (64 ep)"
python - <<'EOF'
import json, sys
sys.path.insert(0, ".")
from openballbot_rl_tpu.cli.evaluate import main as eval_main

root = "outputs/experiments/seed_studies/perlin-cur025-anneal-r5"
out = {}
for s in (0, 1):
    for ck in ("best_model", "final_model"):
        res = eval_main(f"{root}/seed{s}/{ck}", {}, n_test=64,
                        seed=123 + s, verbose=False)
        keep = {k: res[k] for k in ("mean_reward", "std_reward",
                                    "mean_ep_length", "survival_rate")}
        out[f"seed{s}/{ck}"] = keep
        print(f"[chain3] seed{s} {ck}: {keep}", flush=True)
with open(f"{root}/reeval_64ep.json", "w") as f:
    json.dump(out, f, indent=2)
print("[chain3] wrote", f"{root}/reeval_64ep.json")
EOF
rc1=$?
echo "[chain3] re-eval rc=$rc1; settling relay"
sleep 60

echo "[chain3] 2/2 SAC perlin curriculum (3 seeds, 14M abs-matched)"
python scripts/utils/seed_study.py \
    --config configs/train/sac_perlin_curriculum.yaml \
    --set total_timesteps=14000000 \
    --set curriculum.anneal_frac=0.5714286 \
    --set checkpoint_freq=4000000 \
    --seeds 0,1,2 --tag sac-perlin-cur01-14M-r5
rc2=$?
echo "[chain3] SAC study rc=$rc2"
exit $(( rc1 || rc2 ))
