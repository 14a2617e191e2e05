#!/bin/bash
# Round-5 chain 4 (replaces chain3 step 2 after its re-eval completed):
#   1. ent_coef=0 decay probe, 2 seeds (the queued follow-up from
#      docs/design/post_peak_decay.md: the anneal rerun refuted LR as the
#      decay mechanism; entropy creep under the 0.001 bonus is the one
#      monotone training signal left — zeroing the bonus tests it).
#   2. SAC + curriculum study, 3 seeds (VERDICT r4 #5). 12M steps with the
#      curriculum schedule matched in ABSOLUTE steps to the shipped 20M
#      config (anneal ends at 8M either way: 0.4*20M = 0.6666667*12M), so
#      three full seeds + the probe fit the final session's chip budget.
# Launch: setsid nohup tools/run_on_tpu.sh /tmp/r5_chain4.log \
#             bash tools/r5_chain4.sh &
set -u
cd "$(dirname "$0")/.."

echo "[chain4] 1/2 ent_coef=0 probe (2 seeds)"
python scripts/utils/seed_study.py \
    --config configs/train/ppo_perlin_curriculum.yaml \
    --set algo.ent_coef=0.0 \
    --seeds 0,1 --tag perlin-cur025-ent0-r5
rc1=$?
echo "[chain4] ent0 probe rc=$rc1; settling relay"
sleep 60

echo "[chain4] 2/2 SAC perlin curriculum (3 seeds, 12M abs-matched)"
python scripts/utils/seed_study.py \
    --config configs/train/sac_perlin_curriculum.yaml \
    --set total_timesteps=12000000 \
    --set curriculum.anneal_frac=0.6666667 \
    --set checkpoint_freq=4000000 \
    --seeds 0,1,2 --tag sac-perlin-cur01-12M-r5
rc2=$?
echo "[chain4] SAC study rc=$rc2"
exit $(( rc1 || rc2 ))
