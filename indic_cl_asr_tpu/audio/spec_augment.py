"""SpecAugment as a fully vectorized, jit-compiled masking function.

Reference semantics (NeMo parts/submodules/spectr_augment.py:25-113 and the
numba CUDA variant spec_aug_numba.py): per batch item, ``freq_masks`` bands
with start ~ U{0..F-freq_width} and width ~ U{0..freq_width}, plus
``time_masks`` bands where the max width is ``max(1, int(len * time_width))``
when ``time_width`` is a float (adaptive), start ~ U{0..max(1, len - w_max)},
width ~ U{0..w_max} (all bounds inclusive, python random.randint convention).

TPU-first design: no per-sample python loops — a single jax.random draw for
all (batch, mask) pairs and broadcasted-iota comparisons produce the boolean
mask, so the whole augmentation fuses into the surrounding step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    freq_masks: int = 2
    time_masks: int = 10
    freq_width: int = 27
    time_width: float = 0.05  # float -> adaptive fraction of utterance length
    mask_value: float = 0.0


def _band_mask(starts, widths, size: int, axis_len: int):
    """[B, M] starts/widths -> [B, size] bool OR of bands."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
    s = starts[:, :, None]
    w = widths[:, :, None]
    bands = (iota >= s) & (iota < s + w)  # [B, M, size]
    return jnp.any(bands, axis=1)  # [B, size]


def spec_augment(
    spec: jnp.ndarray,
    lengths: jnp.ndarray,
    rng: jax.Array,
    cfg: SpecAugmentConfig = SpecAugmentConfig(),
) -> jnp.ndarray:
    """[B, F, T] spectrogram, [B] valid frame counts -> masked [B, F, T]."""
    B, F, T = spec.shape
    kfs, kfw, kts, ktw = jax.random.split(rng, 4)

    if cfg.freq_masks > 0:
        f_start = jax.random.randint(
            kfs, (B, cfg.freq_masks), 0, max(F - cfg.freq_width, 0) + 1
        )
        f_width = jax.random.randint(
            kfw, (B, cfg.freq_masks), 0, cfg.freq_width + 1
        )
        fmask = _band_mask(f_start, f_width, F, F)  # [B, F]
        spec = jnp.where(fmask[:, :, None], cfg.mask_value, spec)

    if cfg.time_masks > 0:
        if isinstance(cfg.time_width, float) and cfg.time_width <= 1.0:
            w_max = jnp.maximum(
                1, (lengths.astype(jnp.float32) * cfg.time_width).astype(jnp.int32)
            )  # [B]
        else:
            w_max = jnp.full((B,), int(cfg.time_width), jnp.int32)
        start_ub = jnp.maximum(1, lengths.astype(jnp.int32) - w_max)  # [B]
        t_start = jax.random.randint(
            kts, (B, cfg.time_masks), 0, (start_ub + 1)[:, None]
        )
        t_width = jax.random.randint(
            ktw, (B, cfg.time_masks), 0, (w_max + 1)[:, None]
        )
        tmask = _band_mask(t_start, t_width, T, T)  # [B, T]
        spec = jnp.where(tmask[:, None, :], cfg.mask_value, spec)

    return spec
