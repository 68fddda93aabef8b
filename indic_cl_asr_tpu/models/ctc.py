"""CTC head with per-language vocabulary slicing.

Reference: NeMo modules/conv_asr.py:402-528 `ConvASRDecoder` with the fork's
multisoftmax path — a 1x1 Conv to the aggregate vocab (+ shared blank as the
LAST channel) followed by a per-sample boolean ``masked_select`` down to that
language's slice plus blank (conv_asr.py:471-484), then log_softmax.

TPU-first design: languages occupy contiguous, equal-width slices of the
aggregate vocab (token_id_offset bookkeeping), so the reference's boolean
masked_select is exactly a slice-gather. We gather the language's weight
columns FIRST and run one [B, T, d] x [B, d, V_local+1] einsum — computing
V_local+1 logits per frame instead of V_total+1 (a ~n_langs x FLOP/memory
saving over the reference head) while remaining numerically identical.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CTCConfig:
    feat_in: int                   # encoder d_model
    vocab_size_total: int
    n_langs: int
    dtype: Any = jnp.float32

    @property
    def vocab_per_lang(self) -> int:
        return self.vocab_size_total // self.n_langs

    @property
    def blank_local(self) -> int:
        return self.vocab_per_lang


class CTCDecoder(nn.Module):
    cfg: CTCConfig

    @nn.compact
    def __call__(
        self, encoded: jnp.ndarray, lang_ids: jnp.ndarray | None = None,
        return_logits: bool = False,
    ):
        """encoded: [B, T, d]; lang_ids: [B] or None (aggregate output).

        Returns log-probs [B, T, V_local + 1] (or [B, T, V_total + 1] when
        lang_ids is None), blank last — matching the reference's
        log_softmax-after-mask (conv_asr.py:488-490).
        """
        cfg = self.cfg
        # aggregate head: stored as one kernel so checkpoints convert 1:1
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (cfg.feat_in, cfg.vocab_size_total + 1),
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (cfg.vocab_size_total + 1,)
        )

        if lang_ids is None:
            logits = (
                encoded.astype(cfg.dtype) @ kernel.astype(cfg.dtype)
                + bias.astype(cfg.dtype)
            ).astype(jnp.float32)
        else:
            V = cfg.vocab_per_lang
            B = lang_ids.shape[0]
            # language slice + shared blank (last column). The per-sample
            # weight selection is a one-hot matmul over the language axis —
            # MXU-friendly, no strided gather/transpose in the hot path.
            w_langs = kernel[:, : cfg.vocab_size_total].reshape(
                cfg.feat_in, cfg.n_langs, V
            )
            b_langs = bias[: cfg.vocab_size_total].reshape(cfg.n_langs, V)
            onehot = jax.nn.one_hot(lang_ids, cfg.n_langs, dtype=cfg.dtype)
            w = jnp.einsum(
                "dlv,bl->bdv", w_langs.astype(cfg.dtype), onehot,
                preferred_element_type=cfg.dtype,
            )  # [B, d, V]
            w = jnp.concatenate(
                [
                    w,
                    jnp.broadcast_to(
                        kernel[:, -1:].astype(cfg.dtype)[None],
                        (B, cfg.feat_in, 1),
                    ),
                ],
                axis=-1,
            )  # [B, d, V+1]
            b = jnp.concatenate(
                [
                    onehot @ b_langs.astype(cfg.dtype),
                    jnp.broadcast_to(bias[-1:].astype(cfg.dtype)[None],
                                     (B, 1)),
                ],
                axis=-1,
            )  # [B, V+1]
            logits = jnp.einsum(
                "btd,bdv->btv",
                encoded.astype(cfg.dtype),
                w,
                preferred_element_type=jnp.float32,
            ) + b[:, None, :]

        log_probs = jax.nn.log_softmax(logits, axis=-1)
        if return_logits:
            return log_probs, logits
        return log_probs
