"""Memory Aware Synapses as functional pytree transforms.

Reference semantics (cl_baseline_mas.py):
  * while training task t>0 the penalty is a LOSS term
    (:231-234, :70-75):
        loss += mas_lambda * sum_k Omega_k * (theta_k - theta*_k)^2
  * after the task's training epochs, one extra pass accumulates
    importance from the surrogate "output energy" objective
    (:257-287):
        surrogate = (1 - mas_ctx) * mean_{B,T,U} ||joint_logits||^2
                  + mas_ctx * mean_{B,T} ||ctc_logits||^2
        Omega_k += |grad_k(surrogate)|   per batch;  Omega /= n_batches
    and (unlike EWC's decayed merge) OVERWRITES the stored importance;
    theta* is the post-task parameter clone (:288).

The surrogate's joint-logit energy is computed with the same chunked,
rematerialized scheme as the fused RNNT loss, so the full B x T x U x V
joint is never materialized (the reference relies on fused_batch_size
sub-batching and `store_sub_logits` captures for this).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.rnnt_loss_fused import _activate
from ..utils.pytree import tree_where_mask, tree_zeros_like


@dataclasses.dataclass
class MASConfig:
    mas_lambda: float = 1.0
    mas_ctx: float = 0.3


@dataclasses.dataclass
class MASState:
    importance: Any = None  # Omega pytree
    checkpoint: Any = None  # theta* pytree


def penalty(cfg: MASConfig, importance: Any, params: Any, checkpoint: Any):
    """Scalar penalty loss (cl_baseline_mas.py:70-75), already scaled by
    mas_lambda (:234 applies the lambda at the call site; we fold it in)."""
    terms = jax.tree.leaves(
        jax.tree.map(
            lambda o, p, c: jnp.sum(o * (p - c) ** 2),
            importance, params, checkpoint,
        )
    )
    return cfg.mas_lambda * sum(terms)


def make_penalty_fn(cfg: MASConfig, state: MASState):
    """Hook for train/step.py: MAS is a loss term (grads via autodiff)."""
    if state.importance is None or state.checkpoint is None:
        return None

    def penalty_fn(params):
        return penalty(cfg, state.importance, params, state.checkpoint), None

    return penalty_fn


def joint_energy_chunked(
    f_proj, g_proj, head_w, head_b, *, activation: str = "relu",
    chunk_size: int = 64, row_mask=None, uniform_head: bool = False,
):
    """mean over (B, T, U) of sum_v joint_logits^2, chunked over T with
    remat — the reference's rnn_logits surrogate (cl_baseline_mas.py:
    264-268) including its padded positions.

    Masked OUT (our artifacts, not the reference's): frames added by
    chunk-padding (so the energy is chunk-size-invariant) and repeated
    pad rows of the final bucket batch (``row_mask``); the in-bucket
    T/U padding stays included, matching the reference's
    everything-included mean over its pad-to-max tensors."""
    B, T, H = f_proj.shape

    n_chunks = -(-T // chunk_size)
    T_pad = n_chunks * chunk_size
    if T_pad != T:
        f_proj = jnp.pad(f_proj, ((0, 0), (0, T_pad - T), (0, 0)))
    f_chunks = f_proj.reshape(B, n_chunks, chunk_size, H).swapaxes(0, 1)

    @jax.checkpoint
    def chunk_energy(args):
        ci, f_chunk = args
        inp = _activate(
            f_chunk[:, :, None, :] + g_proj[:, None, :, :], activation
        )
        # bf16-input/f32-accumulate on the MXU (same fix as
        # rnnt_loss_fused: the f32 head gather silently promoted the dot)
        if uniform_head:
            # single-language batch: shared head, one large matmul (see
            # rnnt_loss_fused._joint_dot_shared)
            logits = (
                jnp.einsum(
                    "btuh,hv->btuv", inp, head_w[0].astype(inp.dtype),
                    preferred_element_type=jnp.float32,
                )
                + head_b[0]
            )
        else:
            logits = (
                jnp.einsum(
                    "btuh,bhv->btuv", inp, head_w.astype(inp.dtype),
                    preferred_element_type=jnp.float32,
                )
                + head_b[:, None, None, :]
            )
        sq = jnp.sum(logits**2, axis=(2, 3))  # [B, Tc]
        t_abs = ci * chunk_size + jnp.arange(chunk_size)
        sq = jnp.where((t_abs < T)[None, :], sq, 0.0)
        if row_mask is not None:
            sq = jnp.where(row_mask[:, None], sq, 0.0)
        return jnp.sum(sq)

    total = jax.lax.map(
        chunk_energy, (jnp.arange(n_chunks), f_chunks)
    ).sum()
    n_rows = row_mask.sum() if row_mask is not None else B
    return total / (n_rows * T * g_proj.shape[1])


def mas_surrogate(
    cfg: MASConfig, f_proj, g_proj, head_w, head_b, ctc_logits,
    *, activation: str = "relu", chunk_size: int = 64, row_mask=None,
    uniform_head: bool = False,
):
    """(1-ctx) * joint energy + ctx * ctc energy (cl_baseline_mas.py:258-264)."""
    rnnt_energy = joint_energy_chunked(
        f_proj, g_proj, head_w, head_b,
        activation=activation, chunk_size=chunk_size, row_mask=row_mask,
        uniform_head=uniform_head,
    )
    ctc_sq = jnp.sum(ctc_logits.astype(jnp.float32) ** 2, -1)  # [B, T]
    if row_mask is not None:
        ctc_sq = jnp.where(row_mask[:, None], ctc_sq, 0.0)
        ctc_energy = jnp.sum(ctc_sq) / (
            row_mask.sum() * ctc_sq.shape[1]
        )
    else:
        ctc_energy = jnp.mean(ctc_sq)
    return (1.0 - cfg.mas_ctx) * rnnt_energy + cfg.mas_ctx * ctc_energy


def accumulate_importance(importance: Any, surrogate_grads: Any) -> Any:
    """Omega += |grad| per batch (cl_baseline_mas.py:272-276)."""
    return jax.tree.map(
        lambda o, g: o + jnp.abs(g), importance, surrogate_grads
    )


def end_task(
    state: MASState, importance: Any, n_batches: int, params: Any,
    trainable_mask: Any,
) -> MASState:
    """Normalize and OVERWRITE importance (not merged — :287), snapshot
    theta*; frozen leaves get zero importance."""
    importance = jax.tree.map(lambda o: o / n_batches, importance)
    importance = tree_where_mask(
        trainable_mask, importance, tree_zeros_like(importance)
    )
    return MASState(
        importance=importance,
        checkpoint=jax.tree.map(jnp.array, params),
    )
