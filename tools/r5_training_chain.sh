#!/bin/bash
# Round-5 training chain (single TPU client at a time, sequential):
#   1. blind perlin-cur025 with post-curriculum LR anneal, 2 seeds
#      (VERDICT r4 #4: fix post-peak decay; re-run of perlin-cur025-150M-r4
#      with lr_anneal_start 0.6 -> lr_final 3e-5)
#   2. SAC + curriculum at amplitude 0.1 with the two studied SAC fixes,
#      3 seeds (VERDICT r4 #5)
# Launch: setsid nohup tools/run_on_tpu.sh /tmp/r5_chain.log \
#             bash tools/r5_training_chain.sh &
set -u
cd "$(dirname "$0")/.."

echo "[chain] 1/2 blind LR-anneal rerun (2 seeds)"
python scripts/utils/seed_study.py \
    --config configs/train/ppo_perlin_curriculum.yaml \
    --seeds 0,1 --tag perlin-cur025-anneal-r5
rc1=$?
echo "[chain] blind anneal study rc=$rc1; settling relay"
sleep 60

echo "[chain] 2/2 SAC perlin curriculum (3 seeds)"
python scripts/utils/seed_study.py \
    --config configs/train/sac_perlin_curriculum.yaml \
    --seeds 0,1,2 --tag sac-perlin-cur01-r5
rc2=$?
echo "[chain] SAC study rc=$rc2"
exit $(( rc1 || rc2 ))
