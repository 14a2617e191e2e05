"""Port the reference's shipped frozen encoder to a flax artifact.

The reference trains a depth autoencoder and ships its encoder half as a
torch pickle (`outputs/encoders/encoder_epoch_53`, referenced by
configs/train/ppo_directional.yaml:160; architecture
ballbot_rl/encoders/models.py:6-33 = Conv(1->32,k3,s2,p1)+BN+LeakyReLU x2
-> Flatten -> Linear(8192->20) -> BN1d -> Tanh). This tool converts that
state dict into the repo's flax DepthEncoder artifact format
(encoders/training.py save_encoder) so the reference's exact weights run
in this framework's vision pipeline.

Layout details that make the port exact:
  * torch Conv2d(k=3, s=2, p=1) pads (1, 1) per side; flax "SAME" pads
    (0, 1) on even inputs — the artifact records padding="torch" and
    DepthEncoder applies ((1, 1), (1, 1)).
  * torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out).
  * torch flattens NCHW (c, h, w); flax flattens NHWC (h, w, c) — the
    Linear kernel is permuted accordingly.
  * BatchNorm running stats copy into flax batch_stats; eps matches (1e-5).

Verification: N random images + N rendered depth frames through both
implementations (torch eval mode vs flax use_running_average) must agree to
max |dz| < 1e-5 before the artifact is written.

Usage: PYTHONPATH=. python tools/port_reference_encoder.py \
    [--src /root/reference/outputs/encoders/encoder_epoch_53] \
    [--out outputs/encoders/encoder_ref_epoch53]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def load_torch_state(src: str):
    import torch

    m = torch.load(src, map_location="cpu", weights_only=False)
    m.eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    return m, sd


def to_flax(sd: dict, latent_dim: int = 20, hw: int = 64):
    h4 = hw // 4
    c2 = sd["3.weight"].shape[0]
    # torch Linear (out, in=c*h*w) -> flax Dense kernel (in=h*w*c, out)
    wl = sd["7.weight"].reshape(latent_dim, c2, h4, h4)
    wl = wl.transpose(0, 2, 3, 1).reshape(latent_dim, -1).T
    params = {
        "conv0": {"kernel": sd["0.weight"].transpose(2, 3, 1, 0),
                  "bias": sd["0.bias"]},
        "bn0": {"scale": sd["1.weight"], "bias": sd["1.bias"]},
        "conv1": {"kernel": sd["3.weight"].transpose(2, 3, 1, 0),
                  "bias": sd["3.bias"]},
        "bn1": {"scale": sd["4.weight"], "bias": sd["4.bias"]},
        "proj": {"kernel": np.ascontiguousarray(wl), "bias": sd["7.bias"]},
        "bn_out": {"scale": sd["8.weight"], "bias": sd["8.bias"]},
    }
    batch_stats = {
        "bn0": {"mean": sd["1.running_mean"], "var": sd["1.running_var"]},
        "bn1": {"mean": sd["4.running_mean"], "var": sd["4.running_var"]},
        "bn_out": {"mean": sd["8.running_mean"],
                   "var": sd["8.running_var"]},
    }
    asf32 = lambda t: {k: (asf32(v) if isinstance(v, dict)
                           else np.asarray(v, np.float32)) for k, v in t.items()}
    return asf32(params), asf32(batch_stats)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src",
                    default="/root/reference/outputs/encoders/encoder_epoch_53")
    ap.add_argument("--out", default="outputs/encoders/encoder_ref_epoch53")
    ap.add_argument("--n-check", type=int, default=64)
    args = ap.parse_args()

    from openballbot_rl_tpu.utils.devices import force_cpu
    force_cpu()
    import torch

    torch_mod, sd = load_torch_state(args.src)
    latent_dim = sd["7.weight"].shape[0]
    hw = int(np.sqrt(sd["7.weight"].shape[1] // sd["3.weight"].shape[0])) * 4
    params, batch_stats = to_flax(sd, latent_dim, hw)

    import jax
    import jax.numpy as jnp
    from openballbot_rl_tpu.nn.networks import DepthEncoder

    enc = DepthEncoder(latent_dim, use_batchnorm=True, padding="torch")
    variables = {"params": params, "batch_stats": batch_stats}

    # ---- verification batch: random images + rendered depth frames ----
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0.0, 1.0, (args.n_check, 1, hw, hw)).astype(np.float32)
    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.sensors.depth import DepthCameraConfig, DepthCameras
    from openballbot_rl_tpu.physics import hfield as hf

    gen = create_terrain({"type": "perlin", "config": {
        "scale": 25.0, "octaves": 4, "persistence": 0.2, "lacunarity": 2.0}})
    hts = jnp.asarray(gen(293, seed=3), jnp.float32).reshape(1, 293, 293)
    cams = DepthCameras(DepthCameraConfig(height=hw, width=hw))
    off = float(hf.spawn_height_offset(hts[0], 2.0))
    frames = []
    for k in range(8):
        bp = jnp.array([0.5 * k - 2.0, 0.3 * k - 1.2, 0.35 + off], jnp.float32)
        ball = bp + jnp.array([0.0, 0.0, -0.25])
        q = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
        d = cams.render_patch(hts, jnp.asarray(0), 5.0, 2.0, bp, q, ball)
        frames.append(np.asarray(d)[:, None])           # (2, 1, H, W)
    imgs = np.concatenate([imgs] + frames, 0)

    with torch.no_grad():
        z_t = torch_mod(torch.from_numpy(imgs)).numpy()
    z_f = np.asarray(enc.apply(variables, jnp.asarray(imgs), train=False))
    err = np.abs(z_t - z_f).max()
    print(f"torch-vs-flax latent parity over {imgs.shape[0]} images: "
          f"max |dz| = {err:.2e}")
    if err > 1e-5:
        print("PORT FAILED — refusing to write artifact", file=sys.stderr)
        return 1

    from openballbot_rl_tpu.encoders.training import _p_sum, save_encoder
    best = {
        "params": params,
        "batch_stats": batch_stats,
        "meta": {
            "latent_dim": latent_dim, "hw": hw, "in_channels": 1,
            "use_batchnorm": True, "padding": "torch",
            "p_sum": _p_sum(params),
            "source": os.path.basename(args.src),
            "torch_p_sum_abs": float(getattr(torch_mod, "p_sum", 0.0)),
            "port_max_abs_err": float(err),
        },
    }
    save_encoder(args.out, best)
    # round-trip through the loader (p_sum integrity + padding meta)
    from openballbot_rl_tpu.encoders.training import make_frozen_encoder
    encode, meta = make_frozen_encoder(args.out)
    z_r = np.asarray(encode(jnp.asarray(imgs[:4])))
    rt = np.abs(z_r - z_f[:4]).max()
    print(f"artifact round-trip max |dz| = {rt:.2e}")
    print(f"wrote {args.out} (latent_dim={latent_dim}, hw={hw}, "
          f"padding=torch)")
    return 0 if rt < 1e-6 else 1


if __name__ == "__main__":
    sys.exit(main())
