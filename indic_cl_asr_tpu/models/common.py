"""Shared small modules for the model family."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..utils.rng import dropout_keep_mask


class FastDropout(nn.Module):
    """Drop-in replacement for `nn.Dropout` drawing the keep mask as 8-bit
    random bytes (utils/rng.py dropout_keep_mask) — 4x less RNG output
    traffic than bernoulli's uniform-f32 draw, which the op profile showed
    as ~1.4 ms/step of pure RngBitGenerator writes at flagship shapes.
    Same `deterministic` contract and 'dropout' RNG collection as
    nn.Dropout; keep probability quantized to 1/256 (see dropout_keep_mask).
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        keep = dropout_keep_mask(self.make_rng("dropout"), self.rate, x.shape)
        return jnp.where(keep, x / (1.0 - self.rate), jnp.zeros_like(x))
