"""Depth autoencoder (reference: ballbot_rl/encoders/models.py:6-53).

Encoder = the policy's DepthEncoder architecture (nn/networks.py), so
pretrained weights drop directly into the ActorCritic extractor. Decoder
mirrors it with transposed convolutions back to the input resolution with a
sigmoid output, trained with MSE reconstruction loss on depth frames.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from openballbot_rl_tpu.nn.networks import DepthEncoder


class DepthDecoder(nn.Module):
    """Mirror of DepthEncoder: latent -> (C, H, W) sigmoid reconstruction."""
    out_hw: int = 64
    out_channels: int = 1
    channels: int = 32
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h4 = self.out_hw // 4
        x = nn.Dense(self.channels * h4 * h4, dtype=self.compute_dtype,
                     name="proj")(z.astype(self.compute_dtype))
        x = nn.leaky_relu(x)
        x = x.reshape(x.shape[:-1] + (h4, h4, self.channels))
        x = nn.ConvTranspose(self.channels, (3, 3), strides=(2, 2),
                             padding="SAME", dtype=self.compute_dtype,
                             name="deconv0")(x)
        x = nn.leaky_relu(x)
        x = nn.ConvTranspose(self.out_channels, (3, 3), strides=(2, 2),
                             padding="SAME", dtype=self.compute_dtype,
                             name="deconv1")(x)
        x = nn.sigmoid(x)
        return jnp.moveaxis(x, -1, -3).astype(jnp.float32)   # to (C, H, W)


class TinyAutoencoder(nn.Module):
    """Encoder (policy CNN arch) + mirrored decoder (models.py:6-53)."""
    latent_dim: int = 20
    channels: int = 32
    hw: int = 64
    in_channels: int = 1
    use_batchnorm: bool = True
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.encoder = DepthEncoder(self.latent_dim, self.channels,
                                    use_batchnorm=self.use_batchnorm,
                                    compute_dtype=self.compute_dtype,
                                    name="encoder")
        self.decoder = DepthDecoder(self.hw, self.in_channels, self.channels,
                                    compute_dtype=self.compute_dtype,
                                    name="decoder")

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.decoder(self.encoder(x, train=train))

    def encode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.encoder(x, train=train)
