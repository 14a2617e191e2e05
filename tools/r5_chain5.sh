#!/bin/bash
# Round-5 chain 5 (after chain4's SAC study frees the chip): 64-episode
# fresh-bank re-evals of best vs final checkpoints for the two studies too
# slow to re-eval on CPU — the vision frontier study (renders) and the new
# SAC study. Completes the winner's-curse audit (post_peak_decay.md): the
# blind PPO studies' re-evals already ran on CPU.
# Launch: setsid nohup tools/run_on_tpu.sh /tmp/r5_chain5.log \
#             bash tools/r5_chain5.sh &
set -u
cd "$(dirname "$0")/.."

python - <<'EOF'
import json, sys, time
sys.path.insert(0, ".")
from openballbot_rl_tpu.cli.evaluate import main as eval_main

for root, seeds in (
    ("outputs/experiments/seed_studies/vision-cur02-150M-r4", range(5)),
    ("outputs/experiments/seed_studies/sac-perlin-cur01-12M-r5", range(3)),
):
    out = {}
    for s in seeds:
        for ck in ("best_model", "final_model"):
            t0 = time.time()
            try:
                res = eval_main(f"{root}/seed{s}/{ck}", {},
                                n_test=64, seed=123 + s, verbose=False)
            except FileNotFoundError as e:
                print(f"[chain5] skip {root} seed{s} {ck}: {e}", flush=True)
                continue
            keep = {k: res[k] for k in ("mean_reward", "std_reward",
                                        "mean_ep_length", "survival_rate")}
            out[f"seed{s}/{ck}"] = keep
            print(f"[chain5] {root.split('/')[-1]} seed{s} {ck} "
                  f"({time.time()-t0:.0f}s): {keep}", flush=True)
    with open(f"{root}/reeval_64ep.json", "w") as f:
        json.dump(out, f, indent=2)
    print("[chain5] wrote", f"{root}/reeval_64ep.json", flush=True)
EOF
echo "[chain5] done rc=$?"
