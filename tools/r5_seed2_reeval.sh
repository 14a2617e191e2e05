#!/bin/bash
# Round-5 finisher: 64-episode fresh-bank re-eval of the resumed SAC
# seed 2 (best + final), merged into the study's existing reeval_64ep.json
# (seeds 0/1 ran in chain5), then regenerate seed_study.json/npz over all
# three seeds (the seed-2 resume run overwrote it with a 1-seed summary).
# Launch: setsid nohup tools/run_on_tpu.sh /tmp/r5_seed2_reeval.log \
#             bash tools/r5_seed2_reeval.sh &
set -u
cd "$(dirname "$0")/.."

python - <<'EOF'
import json, sys, time
import numpy as np
sys.path.insert(0, ".")
from openballbot_rl_tpu.cli.evaluate import main as eval_main

root = "outputs/experiments/seed_studies/sac-perlin-cur01-12M-r5"
with open(f"{root}/reeval_64ep.json") as f:
    out = json.load(f)
for ck in ("best_model", "final_model"):
    t0 = time.time()
    res = eval_main(f"{root}/seed2/{ck}", {}, n_test=64, seed=125,
                    verbose=False)
    keep = {k: res[k] for k in ("mean_reward", "std_reward",
                                "mean_ep_length", "survival_rate")}
    out[f"seed2/{ck}"] = keep
    print(f"[reeval] seed2 {ck} ({time.time()-t0:.0f}s): {keep}",
          flush=True)
with open(f"{root}/reeval_64ep.json", "w") as f:
    json.dump(out, f, indent=2)
print("[reeval] wrote", f"{root}/reeval_64ep.json", flush=True)

# regenerate the 3-seed aggregate (in-run eval curves)
curves, finals, bests = {}, [], []
for s in (0, 1, 2):
    ev = np.load(f"{root}/seed{s}/results/evaluations.npz")
    mean_curve = ev["results"].mean(axis=1)
    curves[f"seed{s}_timesteps"] = ev["timesteps"]
    curves[f"seed{s}_results"] = ev["results"]
    curves[f"seed{s}_ep_lengths"] = ev["ep_lengths"]
    finals.append(float(mean_curve[-1]))
    bests.append(float(mean_curve.max()))
summary = {
    "config": "configs/train/sac_perlin_curriculum.yaml",
    "note": ("12M abs-matched curriculum (anneal_frac 0.6666667); seed 2 "
             "resumed from its 4.0M checkpoint after a session boundary"),
    "seeds": [0, 1, 2],
    "final_eval_mean": float(np.mean(finals)),
    "final_eval_std": float(np.std(finals)),
    "best_eval_mean": float(np.mean(bests)),
    "best_eval_std": float(np.std(bests)),
    "per_seed_final": finals,
    "per_seed_best": bests,
}
with open(f"{root}/seed_study.json", "w") as f:
    json.dump(summary, f, indent=2)
np.savez(f"{root}/seed_study.npz", **curves)
print(json.dumps(summary, indent=2))
EOF
echo "[reeval] done rc=$?"
