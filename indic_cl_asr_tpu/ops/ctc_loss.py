"""CTC loss wrapper.

The reference wraps torch.nn.CTCLoss (cuDNN kernel) with blank = LAST index,
`mean_batch` reduction and zero_infinity (reference: NeMo losses/ctc.py:
25-82). Two interchangeable lattices (parity-tested against each other,
NumPy, and torch): the native scan (ops/ctc_loss_native.py, default — one
fused shifted-logsumexp per frame with a custom occupancy-formula VJP) and
optax's forward-backward. Adds the reference's blank-last convention,
reduction modes, and zero_infinity guard (as an explicit feasibility test).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def ctc_loss(
    log_probs: jnp.ndarray,   # [B, T, V+1] log-probs (or logits), blank LAST
    frame_lens: jnp.ndarray,  # [B]
    labels: jnp.ndarray,      # [B, U] local token ids (no blanks)
    label_lens: jnp.ndarray,  # [B]
    blank: int | None = None,
    reduction: str = "mean_batch",
    zero_infinity: bool = True,
    impl: str = "native",     # "native" (ops/ctc_loss_native) | "optax"
    row_mask: jnp.ndarray | None = None,  # bool [B]: real (non-repeat) rows
):
    B, T, V1 = log_probs.shape
    if blank is None:
        blank = V1 - 1
    u_iota = jnp.arange(labels.shape[1])[None, :]

    if impl == "native":
        from .ctc_loss_native import ctc_nll_native

        lp = jax.nn.log_softmax(log_probs.astype(jnp.float32), axis=-1)
        nll = ctc_nll_native(
            lp, labels.astype(jnp.int32), frame_lens.astype(jnp.int32),
            label_lens.astype(jnp.int32), blank,
        )
    else:
        t_iota = jnp.arange(T)[None, :]
        logit_paddings = (t_iota >= frame_lens[:, None]).astype(jnp.float32)
        label_paddings = (u_iota >= label_lens[:, None]).astype(jnp.float32)
        nll = optax.ctc_loss(
            log_probs.astype(jnp.float32),
            logit_paddings,
            labels.astype(jnp.int32),
            label_paddings,
            blank_id=blank,
        )
    if zero_infinity:
        # torch zero_infinity semantics (losses/ctc.py zero_infinity=True):
        # infeasible alignments contribute 0. optax encodes impossibility as
        # a large-but-finite value (log_epsilon), so test feasibility
        # directly: frames >= labels + adjacent repeats (each repeat needs a
        # separating blank).
        valid_lbl = (u_iota < label_lens[:, None])[:, 1:]
        repeats = jnp.sum(
            (labels[:, 1:] == labels[:, :-1]) & valid_lbl, axis=1
        )
        feasible = frame_lens >= label_lens + repeats
        nll = jnp.where(feasible & jnp.isfinite(nll), nll, 0.0)

    from .rnnt_loss import _reduce

    return _reduce(nll, label_lens, reduction, row_mask)
