"""Conditioning classifier for FID/IS evaluation (flax.linen).

Parity with /root/reference/tqdne/classifier.py: Encoder backbone ->
global mean-pool over spatial dims -> 2-layer SiLU MLP ``embed`` ->
linear head.  Trained with inverse-frequency-weighted cross-entropy on
magnitude x distance bins; the embeddings feed the Frechet "Inception"
Distance and the logits the Inception Score (tqdne_tpu.eval.metrics).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tqdne_tpu.models.autoencoder import Encoder


class Classifier(nn.Module):
    encoder_config: dict
    num_classes: int
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            **{**dict(self.encoder_config), "train": self.train, "dtype": self.dtype},
            name="encoder",
        )
        width = self.encoder_config["out_channels"]
        dense = lambda name: nn.Dense(  # noqa: E731
            width, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        self.mlp1 = dense("mlp1")
        self.mlp2 = dense("mlp2")
        self.head = nn.Dense(
            self.num_classes, dtype=self.dtype, param_dtype=jnp.float32, name="head"
        )

    def embed(self, x):
        h = self.encoder(x)  # (B, *spatial, C)
        h = jnp.mean(h, axis=tuple(range(1, h.ndim - 1)))  # global spatial mean-pool
        h = self.mlp1(nn.silu(h))
        h = self.mlp2(nn.silu(h))
        return h.astype(jnp.float32)  # embeddings feed host-side FID math

    def __call__(self, x):
        return self.head(self.embed(x)).astype(jnp.float32)


def weighted_cross_entropy(logits, labels, class_weights):
    """Inverse-frequency weighted CE, matching torch nn.CrossEntropyLoss(weight=w):
    mean is normalized by the sum of the per-sample weights."""
    log_probs = nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    w = class_weights[labels]
    return jnp.sum(w * nll) / jnp.sum(w)
