"""Policy / value / feature-extractor networks (flax.linen).

Architecture parity with the reference policy stack:
  - multimodal feature extractor over dict observations
    (ballbot_rl/policies/mlp_policy.py:7-157): each "rgbd_*" key goes through
    a small CNN [Conv(C->32,k3,s2) + BN + LeakyReLU] x2 -> flatten ->
    Dense(20) -> BN -> tanh; non-image keys are passed through flat; all
    streams concatenate. Optionally the CNN is a frozen pretrained encoder.
  - actor/critic heads: 4 x 128 MLPs with LeakyReLU
    (ballbot_rl/training/train.py:38-47), Gaussian policy with state-
    independent log-std (SB3 default for PPO).

TPU notes: convolutions over 64x64x1 inputs and 128-wide MLPs are small; the
batch axis provides the parallelism. bfloat16 activations are available via
`compute_dtype` (params stay fp32).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class DepthEncoder(nn.Module):
    """CNN encoder for depth/RGB-D images (mlp_policy.py:19-51).

    Input: (..., C, H, W) channels-first like the reference obs. Output:
    (..., latent_dim) in [-1, 1] (tanh).
    """
    latent_dim: int = 20
    channels: int = 32
    use_batchnorm: bool = True
    compute_dtype: Any = jnp.float32
    # "SAME" (default) or "torch": torch's Conv2d(k=3, s=2, p=1) pads (1, 1)
    # per side where SAME pads (0, 1) on even inputs — weights ported from
    # the reference's shipped torch encoder need "torch" to reproduce its
    # outputs (tools/port_reference_encoder.py)
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = ((1, 1), (1, 1)) if self.padding == "torch" else self.padding
        # to NHWC
        x = jnp.moveaxis(x, -3, -1).astype(self.compute_dtype)
        for i in range(2):
            x = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=pad,
                        dtype=self.compute_dtype, name=f"conv{i}")(x)
            if self.use_batchnorm:
                x = nn.BatchNorm(use_running_average=not train,
                                 dtype=self.compute_dtype, name=f"bn{i}")(x)
            x = nn.leaky_relu(x)
        x = x.reshape(x.shape[:-3] + (-1,))
        x = nn.Dense(self.latent_dim, dtype=self.compute_dtype, name="proj")(x)
        if self.use_batchnorm:
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.compute_dtype, name="bn_out")(x)
        return jnp.tanh(x).astype(jnp.float32)


class Extractor(nn.Module):
    """Dict-obs feature extractor (mlp_policy.py:7-157).

    Image keys (name starts with "rgbd") go through a shared-architecture
    (but per-key-parameterized) DepthEncoder; everything else is flattened
    and concatenated raw (mlp_policy.py:140-157).
    """
    latent_dim: int = 20
    use_batchnorm: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray], train: bool = False):
        feats = []
        for key in sorted(obs.keys()):
            x = obs[key]
            if key.startswith("rgbd"):
                enc = DepthEncoder(self.latent_dim, use_batchnorm=self.use_batchnorm,
                                   compute_dtype=self.compute_dtype,
                                   name=f"encoder_{key}")
                feats.append(enc(x, train=train))
            else:
                feats.append(x.reshape(x.shape[:-1] + (-1,))
                             if x.ndim > 1 else x)
        return jnp.concatenate(feats, axis=-1)


class MLPHead(nn.Module):
    """4 x hidden LeakyReLU trunk (train.py:38-47) + linear output."""
    out_dim: int
    hidden: Sequence[int] = (128, 128, 128, 128)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.compute_dtype)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, dtype=self.compute_dtype, name=f"fc{i}")(x)
            x = nn.leaky_relu(x)
        return nn.Dense(self.out_dim, dtype=self.compute_dtype,
                        name="out")(x).astype(jnp.float32)


class ActorCritic(nn.Module):
    """Shared extractor + separate pi/vf heads + state-independent log_std.

    Mirrors SB3 MultiInputPolicy with shared features_extractor
    (train.py:48-50: "shared by the policy and the value networks").
    """
    action_dim: int = 3
    hidden: Sequence[int] = (128, 128, 128, 128)
    latent_dim: int = 20
    use_batchnorm: bool = True
    log_std_init: float = 0.0
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray], train: bool = False):
        feats = Extractor(self.latent_dim, use_batchnorm=self.use_batchnorm,
                          compute_dtype=self.compute_dtype,
                          name="extractor")(obs, train=train)
        mean = MLPHead(self.action_dim, self.hidden,
                       compute_dtype=self.compute_dtype, name="pi")(feats)
        value = MLPHead(1, self.hidden, compute_dtype=self.compute_dtype,
                        name="vf")(feats)[..., 0]
        log_std = self.param("log_std", nn.initializers.constant(self.log_std_init),
                             (self.action_dim,))
        return mean, log_std, value


class SquashedGaussianActor(nn.Module):
    """SAC actor: extractor + trunk -> state-dependent (mean, log_std),
    tanh-squashed Gaussian over [-1, 1]^action_dim.

    Counterpart of SB3's SACPolicy actor (the reference's evaluator accepts
    SAC checkpoints, ballbot_rl/evaluation/evaluate.py:25-48, but the
    reference never ships a SAC trainer — this framework does).
    """
    action_dim: int = 3
    hidden: Sequence[int] = (256, 256)
    latent_dim: int = 20
    use_batchnorm: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray], train: bool = False):
        feats = Extractor(self.latent_dim, use_batchnorm=self.use_batchnorm,
                          compute_dtype=self.compute_dtype,
                          name="extractor")(obs, train=train)
        x = feats.astype(self.compute_dtype)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, dtype=self.compute_dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        mean = nn.Dense(self.action_dim, dtype=self.compute_dtype,
                        name="mean")(x).astype(jnp.float32)
        log_std = nn.Dense(self.action_dim, dtype=self.compute_dtype,
                           name="log_std")(x).astype(jnp.float32)
        return mean, jnp.clip(log_std, -20.0, 2.0)


class TwinQ(nn.Module):
    """SAC critic: extractor(obs) ++ action -> two independent Q heads."""
    hidden: Sequence[int] = (256, 256)
    latent_dim: int = 20
    use_batchnorm: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray], actions: jnp.ndarray,
                 train: bool = False):
        feats = Extractor(self.latent_dim, use_batchnorm=self.use_batchnorm,
                          compute_dtype=self.compute_dtype,
                          name="extractor")(obs, train=train)
        x = jnp.concatenate([feats, actions], axis=-1)
        qs = []
        for q in range(2):
            h = x.astype(self.compute_dtype)
            for i, width in enumerate(self.hidden):
                h = nn.Dense(width, dtype=self.compute_dtype,
                             name=f"q{q}_fc{i}")(h)
                h = nn.relu(h)
            qs.append(nn.Dense(1, dtype=self.compute_dtype,
                               name=f"q{q}_out")(h)[..., 0].astype(jnp.float32))
        return qs[0], qs[1]


def squashed_sample_and_logp(key, mean, log_std):
    """Sample a ~ tanh(N(mean, std)) and its log-density (SAC change of
    variables: logp = logp_gauss - sum log(1 - tanh(u)^2))."""
    u = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
    a = jnp.tanh(u)
    # log(1 - tanh(u)^2) = 2*(log 2 - u - softplus(-2u)), numerically stable
    logp = gaussian_log_prob(mean, log_std, u) - jnp.sum(
        2.0 * (jnp.log(2.0) - u - jax.nn.softplus(-2.0 * u)), axis=-1)
    return a, logp


def gaussian_log_prob(mean, log_std, actions):
    std = jnp.exp(log_std)
    z = (actions - mean) / std
    return jnp.sum(-0.5 * z ** 2 - log_std - 0.5 * jnp.log(2 * jnp.pi), axis=-1)


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))


def sample_action(key, mean, log_std):
    return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)


def build_policy_network(config):
    """Resolve the PPO policy network from a (run) config's `policy` section.

    The single construction path shared by cli/train.py and every
    checkpoint consumer (ballbot-eval / ballbot-visualize-model /
    ballbot-collect), so a run trained with non-default
    policy.config.hidden_sizes restores correctly everywhere (round-1
    advisor finding: evaluate.py hardcoded the 4x128 default and failed to
    restore such checkpoints). Mirrors the reference's policy_kwargs
    resolution in ballbot_rl/training/train.py:38-56.
    """
    pol_cfg = (config or {}).get("policy", {}) or {}
    pol_type = pol_cfg.get("type", "actor_critic")
    pol_kwargs = dict(pol_cfg.get("config", {}) or {})
    hidden = tuple(pol_kwargs.pop("hidden_sizes", (128, 128, 128, 128)))
    if pol_type in ("actor_critic", "mlp"):
        return ActorCritic(hidden=hidden, use_batchnorm=False)
    from openballbot_rl_tpu.core.factories import create_policy

    return create_policy({"type": pol_type})(**pol_kwargs)
