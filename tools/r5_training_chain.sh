#!/bin/bash
# Round-5 training chain (single TPU client at a time, sequential):
#   1. vision seed 4 rerun (the first attempt died at 73M/150M when the
#      session ended; only checkpoint was at 131k so resume gains nothing)
#      + re-aggregate the vision study to the paper's 5-seed protocol
#      (VERDICT r4 #6)
#   2. blind perlin-cur025 with post-curriculum LR anneal, 2 seeds
#      (VERDICT r4 #4: fix post-peak decay; re-run of perlin-cur025-150M-r4
#      with lr_anneal_start 0.6 -> lr_final 3e-5)
#   3. SAC + curriculum at amplitude 0.1 with the two studied SAC fixes,
#      3 seeds (VERDICT r4 #5)
# Launch: setsid nohup tools/run_on_tpu.sh /tmp/r5_chain.log \
#             bash tools/r5_training_chain.sh &
set -u
cd "$(dirname "$0")/.."
VROOT=outputs/experiments/seed_studies/vision-cur02-150M-r4

echo "[chain] 1/3 vision seed 4 (fresh; wiping the 73M partial)"
rm -rf "$VROOT/seed4"
python - <<'EOF'
import sys
sys.path.insert(0, ".")
from openballbot_rl_tpu.core.config import load_training_config
from openballbot_rl_tpu.cli.train import main as train_main
config = load_training_config("configs/train/ppo_vision_curriculum.yaml")
train_main(config, 4,
           out_dir="outputs/experiments/seed_studies/vision-cur02-150M-r4/seed4",
           verbose=True, assume_yes=True)
EOF
rc1=$?
python scripts/utils/aggregate_seed_study.py "$VROOT"
echo "[chain] vision seed4 rc=$rc1; settling relay"
sleep 60

echo "[chain] 2/3 blind LR-anneal rerun (2 seeds)"
python scripts/utils/seed_study.py \
    --config configs/train/ppo_perlin_curriculum.yaml \
    --seeds 0,1 --tag perlin-cur025-anneal-r5
rc2=$?
echo "[chain] blind anneal study rc=$rc2; settling relay"
sleep 60

echo "[chain] 3/3 SAC perlin curriculum (3 seeds)"
python scripts/utils/seed_study.py \
    --config configs/train/sac_perlin_curriculum.yaml \
    --seeds 0,1,2 --tag sac-perlin-cur01-r5
rc3=$?
echo "[chain] SAC study rc=$rc3"
exit $(( rc1 || rc2 || rc3 ))
