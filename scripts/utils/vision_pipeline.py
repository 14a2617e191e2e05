"""One-process vision pipeline: collect depth -> pretrain encoder -> train.

The reference runs this as three CLIs (ballbot-collect / ballbot-pretrain /
ballbot-train, SURVEY.md §3.5); chaining them in one process keeps a single
TPU client for the whole pipeline (the axon relay wedges between clients).

    tools/run_on_tpu.sh /tmp/vision.log python scripts/utils/vision_pipeline.py \
        --train-config configs/train/ppo_vision_paper.yaml --tag vision-paper
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--train-config", required=True)
    p.add_argument("--tag", required=True)
    p.add_argument("--n-frames", type=int, default=20000)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--seed", type=int, default=10)
    p.add_argument("--skip-encoder", action="store_true",
                   help="reuse the encoder the config points at")
    args = p.parse_args(argv)

    from openballbot_rl_tpu.core.config import load_training_config

    config = load_training_config(args.train_config)
    enc_path = config.get("frozen_cnn", "outputs/encoders/encoder_r2")

    if not args.skip_encoder:
        from openballbot_rl_tpu.cli.collect import main as collect_main
        from openballbot_rl_tpu.cli.pretrain import main as pretrain_main

        frames_path = f"outputs/datasets/depth_{args.tag}.npz"
        print(f"[pipeline] collecting {args.n_frames} depth frames "
              f"on the training terrain distribution", flush=True)
        collect_main(dict(config), args.n_frames, frames_path,
                     batch=128, seed=args.seed)
        print(f"[pipeline] pretraining encoder -> {enc_path}", flush=True)
        pretrain_main([frames_path], enc_path, epochs=args.epochs,
                      seed=args.seed)

    from openballbot_rl_tpu.cli.train import main as train_main

    out_dir = os.path.join("outputs", "experiments", "runs", args.tag)
    print(f"[pipeline] training -> {out_dir}", flush=True)
    train_main(config, args.seed, out_dir=out_dir, verbose=True,
               assume_yes=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
