"""`ballbot-pretrain`: train the depth autoencoder, save the frozen encoder.

Counterpart of ballbot_rl/encoders/pretrain.py:13-64 (dataset load, 80/20
split, batch 64, 100 epochs, lr 1e-3) with a jitted JAX train loop and a flax
msgpack artifact (+ p_sum integrity stamp) instead of a torch pickle.
"""
from __future__ import annotations

import argparse
import sys


def main(data_paths, out: str, epochs: int = 100, batch_size: int = 64,
         lr: float = 1e-3, latent_dim: int = 20, seed: int = 0,
         verbose: bool = True) -> str:
    from openballbot_rl_tpu.data.dataset import DepthImageDataset
    from openballbot_rl_tpu.encoders.training import (
        save_encoder, train_autoencoder)

    npz = [p for p in data_paths if p.endswith(".npz")]
    roots = [p for p in data_paths if not p.endswith(".npz")]
    ds = None
    if npz:
        ds = DepthImageDataset.from_npz(*npz)
    if roots:
        png = DepthImageDataset.from_png_tree(*roots)
        ds = png if ds is None else ds.merge(png)
    if ds is None or len(ds) == 0:
        raise SystemExit("no training data found")
    if verbose:
        print(f"dataset: {ds.frames.shape}")

    best, hist = train_autoencoder(
        ds.frames, latent_dim=latent_dim, epochs=epochs,
        batch_size=batch_size, lr=lr, seed=seed, verbose=verbose)
    save_encoder(out, best)
    if verbose:
        print(f"best encoder (val {best['meta']['val_loss']:.5f} @ epoch "
              f"{best['meta']['epoch']}) -> {out}")
    return out


def cli_main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Pretrain the depth autoencoder")
    p.add_argument("--data", nargs="+", required=True,
                   help="npz files and/or PNG-tree roots")
    p.add_argument("--out", default="outputs/encoders/encoder")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--latent-dim", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    main(args.data, args.out, epochs=args.epochs, batch_size=args.batch_size,
         lr=args.lr, latent_dim=args.latent_dim, seed=args.seed)
    return 0


if __name__ == "__main__":
    sys.exit(cli_main())
