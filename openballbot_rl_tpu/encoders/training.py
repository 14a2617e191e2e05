"""Autoencoder training + frozen-encoder persistence.

Counterpart of ballbot_rl/encoders/training.py:10-77: Adam, MSE
reconstruction loss, train/val split, keep the best-val encoder, stamp a
parameter-sum integrity value (`p_sum`, mirrors mlp_policy.py:114-129's
integrity check) — but as a jitted JAX train loop over device-resident data
and a flax msgpack artifact instead of a torch module pickle.
"""
from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from openballbot_rl_tpu.encoders.models import TinyAutoencoder


def _p_sum(tree) -> float:
    return float(sum(jnp.sum(x) for x in jax.tree.leaves(tree)))


def train_autoencoder(images: np.ndarray,
                      latent_dim: int = 20,
                      epochs: int = 100,
                      batch_size: int = 64,
                      lr: float = 1e-3,
                      val_frac: float = 0.2,
                      seed: int = 0,
                      use_batchnorm: bool = True,
                      log_every: int = 10,
                      verbose: bool = True) -> Tuple[Dict, Dict]:
    """Train on images (N, C, H, W) float in [0, 1].

    Returns (best_state, history): best_state has encoder params/batch_stats
    + metadata; history has per-epoch train/val losses.
    """
    images = np.asarray(images, np.float32)
    n, c, h, w = images.shape
    assert h == w, "square frames expected"
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_val = max(1, int(n * val_frac))
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    x_train = jnp.asarray(images[train_idx])
    x_val = jnp.asarray(images[val_idx])

    model = TinyAutoencoder(latent_dim=latent_dim, hw=h, in_channels=c,
                            use_batchnorm=use_batchnorm)
    key = jax.random.PRNGKey(seed)
    variables = model.init(key, x_train[:2], train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    steps_per_epoch = max(1, len(train_idx) // batch_size)

    @jax.jit
    def train_epoch(params, batch_stats, opt_state, key):
        def one_step(carry, k):
            params, batch_stats, opt_state = carry
            idx = jax.random.randint(k, (batch_size,), 0, x_train.shape[0])
            xb = x_train[idx]

            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, xb, train=True,
                    mutable=["batch_stats"])
                return jnp.mean((out - xb) ** 2), mut["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state), loss

        keys = jax.random.split(key, steps_per_epoch)
        (params, batch_stats, opt_state), losses = jax.lax.scan(
            one_step, (params, batch_stats, opt_state), keys)
        return params, batch_stats, opt_state, losses.mean()

    @jax.jit
    def val_loss(params, batch_stats):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          x_val, train=False)
        return jnp.mean((out - x_val) ** 2)

    best = None
    best_val = np.inf
    history = {"train_loss": [], "val_loss": []}
    for epoch in range(epochs):
        key, k = jax.random.split(key)
        params, batch_stats, opt_state, tr_loss = train_epoch(
            params, batch_stats, opt_state, k)
        vl = float(val_loss(params, batch_stats))
        history["train_loss"].append(float(tr_loss))
        history["val_loss"].append(vl)
        if vl < best_val:
            best_val = vl
            enc_params = params["encoder"]
            enc_bs = batch_stats.get("encoder", {})
            best = {
                "params": jax.tree.map(np.asarray, enc_params),
                "batch_stats": jax.tree.map(np.asarray, enc_bs),
                "meta": {
                    "latent_dim": latent_dim, "hw": h, "in_channels": c,
                    "use_batchnorm": use_batchnorm,
                    "val_loss": vl, "epoch": epoch,
                    "p_sum": _p_sum(enc_params),
                },
            }
        if verbose and (epoch % log_every == 0 or epoch == epochs - 1):
            print(f"epoch {epoch:3d}  train {float(tr_loss):.5f}  "
                  f"val {vl:.5f}  best {best_val:.5f}")
    return best, history


def save_encoder(path: str, best: Dict) -> None:
    """Persist the encoder as flax msgpack + JSON metadata sidecar."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(
            {"params": best["params"], "batch_stats": best["batch_stats"]}))
    with open(path + ".json", "w") as f:
        json.dump(best["meta"], f, indent=2)


def load_encoder(path: str) -> Dict:
    """Load an encoder artifact; verifies the p_sum integrity stamp
    (reference check: mlp_policy.py:114-129)."""
    with open(path + ".json") as f:
        meta = json.load(f)
    from openballbot_rl_tpu.nn.networks import DepthEncoder
    enc = DepthEncoder(meta["latent_dim"],
                       use_batchnorm=meta["use_batchnorm"],
                       padding=meta.get("padding", "SAME"))
    dummy = jnp.zeros((1, meta["in_channels"], meta["hw"], meta["hw"]))
    template = enc.init(jax.random.PRNGKey(0), dummy, train=True)
    with open(path, "rb") as f:
        restored = serialization.from_bytes(
            {"params": template["params"],
             "batch_stats": template.get("batch_stats", {})}, f.read())
    got = _p_sum(restored["params"])
    want = float(meta["p_sum"])
    if abs(got - want) > 1e-3 * max(1.0, abs(want)):
        raise ValueError(
            f"encoder integrity check failed: p_sum {got} != stored {want}")
    return {"params": restored["params"],
            "batch_stats": restored["batch_stats"], "meta": meta}


def make_frozen_encoder(path: str) -> Tuple[Callable, Dict]:
    """Build the frozen `(K, C, H, W) -> (K, latent)` encode_fn for the
    vision env / extractor (reference frozen branch: mlp_policy.py:52-138)."""
    art = load_encoder(path)
    from openballbot_rl_tpu.nn.networks import DepthEncoder
    enc = DepthEncoder(art["meta"]["latent_dim"],
                       use_batchnorm=art["meta"]["use_batchnorm"],
                       padding=art["meta"].get("padding", "SAME"))
    variables = {"params": art["params"], "batch_stats": art["batch_stats"]}

    def encode(imgs):
        z = enc.apply(variables, imgs, train=False)
        return jax.lax.stop_gradient(z)

    return encode, art["meta"]
