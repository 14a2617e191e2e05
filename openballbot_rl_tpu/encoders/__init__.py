"""Depth-image autoencoder pretraining (reference: ballbot_rl/encoders/)."""
from openballbot_rl_tpu.encoders.models import TinyAutoencoder
from openballbot_rl_tpu.encoders.training import (
    load_encoder, make_frozen_encoder, train_autoencoder)

__all__ = ["TinyAutoencoder", "train_autoencoder", "load_encoder",
           "make_frozen_encoder"]
