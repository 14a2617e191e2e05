"""Encoder pretraining + data pipeline tests (reference: ballbot_rl/encoders,
ballbot_rl/data)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openballbot_rl_tpu.data.dataset import DepthImageDataset
from openballbot_rl_tpu.encoders.models import TinyAutoencoder
from openballbot_rl_tpu.encoders.training import (
    load_encoder, make_frozen_encoder, save_encoder, train_autoencoder)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    # structured fake depth: smooth gradients + noise, in [0, 1]
    base = np.linspace(0, 1, 16)[None, :] * np.ones((16, 1))
    f = base[None, None] + 0.1 * rng.standard_normal((64, 1, 16, 16))
    return np.clip(f, 0, 1).astype(np.float32)


class TestAutoencoder:
    def test_shapes(self, frames):
        model = TinyAutoencoder(latent_dim=8, hw=16)
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(frames[:2]), train=True)
        out = model.apply(v, jnp.asarray(frames[:2]), train=False)
        assert out.shape == (2, 1, 16, 16)
        z = model.apply(v, jnp.asarray(frames[:2]), train=False,
                        method=TinyAutoencoder.encode)
        assert z.shape == (2, 8)
        assert float(jnp.abs(z).max()) <= 1.0  # tanh latent

    def test_training_reduces_loss(self, frames):
        best, hist = train_autoencoder(frames, latent_dim=8, epochs=6,
                                       batch_size=16, verbose=False)
        assert hist["val_loss"][-1] <= hist["val_loss"][0] + 1e-6
        assert best["meta"]["latent_dim"] == 8

    def test_save_load_integrity(self, frames, tmp_path):
        best, _ = train_autoencoder(frames, latent_dim=8, epochs=2,
                                    batch_size=16, verbose=False)
        path = str(tmp_path / "enc")
        save_encoder(path, best)
        art = load_encoder(path)
        assert art["meta"]["p_sum"] == best["meta"]["p_sum"]
        # corrupt the stamp -> integrity error (mlp_policy.py:114-129)
        import json
        meta = dict(art["meta"]); meta["p_sum"] += 10.0
        with open(path + ".json", "w") as f:
            json.dump(meta, f)
        with pytest.raises(ValueError, match="integrity"):
            load_encoder(path)

    def test_frozen_encoder_fn(self, frames, tmp_path):
        best, _ = train_autoencoder(frames, latent_dim=8, epochs=2,
                                    batch_size=16, verbose=False)
        path = str(tmp_path / "enc")
        save_encoder(path, best)
        encode, meta = make_frozen_encoder(path)
        z = encode(jnp.asarray(frames[:3]))
        assert z.shape == (3, 8)
        # frozen: no gradient flows
        g = jax.grad(lambda x: encode(x).sum())(jnp.asarray(frames[:1]))
        assert float(jnp.abs(g).max()) == 0.0


class TestDataset:
    def test_npz_roundtrip(self, frames, tmp_path):
        p1, p2 = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
        np.savez_compressed(p1, frames=frames[:10])
        np.savez_compressed(p2, frames=frames[10:20])
        ds = DepthImageDataset.from_npz(p1, p2)
        assert len(ds) == 20
        assert ds[0].shape == (1, 16, 16)

    def test_merge(self, frames):
        a = DepthImageDataset(frames[:5])
        b = DepthImageDataset(frames[5:8])
        assert len(a.merge(b)) == 8

    def test_png_tree_roundtrip(self, frames, tmp_path):
        from openballbot_rl_tpu.data.collect import export_png_tree
        root = str(tmp_path / "log_0")
        export_png_tree(root, frames[:6], episode=0)
        ds = DepthImageDataset.from_png_tree(root)
        assert len(ds) == 6
        np.testing.assert_allclose(ds.frames[:, 0], frames[:6, 0], atol=1 / 255)
