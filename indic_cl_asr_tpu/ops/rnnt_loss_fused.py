"""Streaming (chunked) RNNT loss: joint head fused into the loss.

The reference bounds the B x T x U x V joint-lattice memory by slicing the
batch into `fused_batch_size` sub-batches inside the joint module
(reference: NeMo modules/rnnt.py:1403-1561) — a GPU workaround that also
drags WER computation into the training step. The TPU-native replacement:

  * the joint is evaluated in chunks along T; each chunk's [B, Tc, U+1, V+1]
    logits are immediately reduced to blank/label log-prob slabs and
    discarded;
  * `jax.checkpoint` on the chunk function makes backward RE-compute each
    chunk's logits instead of storing them — peak memory is
    O(B*T*U) for the lattice inputs plus ONE chunk of logits, for any T;
  * the lattice DP itself is ops/rnnt_loss.py's associative-scan kernel.

This is exact (same numbers as the materialized path), not an approximation.
"""

from __future__ import annotations

import functools
import os
import warnings

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..utils.rng import dropout_keep_mask
from .rnnt_loss import _reduce, rnnt_nll_from_logprobs


def _activate(x, activation: str):
    if activation == "relu":
        return jax.nn.relu(x)
    if activation == "tanh":
        return jnp.tanh(x)
    if activation == "sigmoid":
        return jax.nn.sigmoid(x)
    raise ValueError(activation)


@jax.custom_vjp
def _joint_dot(inp, w):
    """btuh,bhv->btuv with f32 accumulation AND a mixed-precision backward:
    the cotangent arriving from log_softmax is f32, which would promote
    both backward dots (d_inp, d_w — together 2/3 of the joint FLOPs) to
    all-f32 matmuls at half MXU rate. Casting the cotangent to the compute
    dtype first (bf16 at flagship) keeps them MXU-native with f32
    accumulation — the standard AMP backward contract. No-op at f32."""
    return jnp.einsum(
        "btuh,bhv->btuv", inp, w, preferred_element_type=jnp.float32
    )


def _joint_dot_fwd(inp, w):
    return _joint_dot(inp, w), (inp, w)


def _joint_dot_bwd(res, g):
    inp, w = res
    gc = g.astype(inp.dtype)
    d_inp = jnp.einsum(
        "btuv,bhv->btuh", gc, w, preferred_element_type=jnp.float32
    ).astype(inp.dtype)
    d_w = jnp.einsum(
        "btuh,btuv->bhv", inp, gc, preferred_element_type=jnp.float32
    ).astype(w.dtype)
    return d_inp, d_w


_joint_dot.defvjp(_joint_dot_fwd, _joint_dot_bwd)


@jax.custom_vjp
def _joint_dot_split(inp, w_lab, w_blank):
    """Blank-column split of the joint head dot. V+1=257 at flagship pads
    to 3x128 lanes on the MXU (~67% tile ceiling, ~56% measured); slicing
    the head into labels [B,H,V] (V=256 -> exact 2x128 tiles) plus a
    rank-1 blank matvec (1/256 of the FLOPs) restores full tiling on the
    largest FLOP block in the loss path. Same AMP contract as _joint_dot:
    bf16 MXU inputs, f32 accumulation, cotangents cast back to bf16."""
    lab = jnp.einsum(
        "btuh,bhv->btuv", inp, w_lab, preferred_element_type=jnp.float32
    )
    blk = jnp.einsum(
        "btuh,bh->btu", inp, w_blank, preferred_element_type=jnp.float32
    )
    return lab, blk


def _joint_dot_split_fwd(inp, w_lab, w_blank):
    return _joint_dot_split(inp, w_lab, w_blank), (inp, w_lab, w_blank)


def _joint_dot_split_bwd(res, g):
    inp, w_lab, w_blank = res
    gl = g[0].astype(inp.dtype)
    gb = g[1].astype(inp.dtype)
    # the blank contribution to d_inp is a broadcast multiply that XLA
    # fuses into the label-dot consumer — no extra [B,T,U,H] pass
    d_inp = (
        jnp.einsum(
            "btuv,bhv->btuh", gl, w_lab, preferred_element_type=jnp.float32
        )
        + gb[..., None].astype(jnp.float32)
        * w_blank[:, None, None, :].astype(jnp.float32)
    ).astype(inp.dtype)
    d_w_lab = jnp.einsum(
        "btuh,btuv->bhv", inp, gl, preferred_element_type=jnp.float32
    ).astype(w_lab.dtype)
    d_w_blank = jnp.einsum(
        "btuh,btu->bh", inp, gb, preferred_element_type=jnp.float32
    ).astype(w_blank.dtype)
    return d_inp, d_w_lab, d_w_blank


_joint_dot_split.defvjp(_joint_dot_split_fwd, _joint_dot_split_bwd)


@jax.custom_vjp
def _joint_dot_shared(inp, w):
    """Uniform-language variant of _joint_dot: ONE shared [H, V+1] head.

    The per-sample form lowers to B independent [Tc*U, H] x [H, V] matmuls
    (~50-60% MXU efficiency in the op profile); sharing the weight turns
    each chunk into a single large matmul and collapses d_w to one
    reduction. Same AMP contract (bf16 MXU inputs, f32 accumulation,
    cotangents cast to the compute dtype)."""
    return jnp.einsum(
        "btuh,hv->btuv", inp, w, preferred_element_type=jnp.float32
    )


def _joint_dot_shared_fwd(inp, w):
    return _joint_dot_shared(inp, w), (inp, w)


def _joint_dot_shared_bwd(res, g):
    inp, w = res
    gc = g.astype(inp.dtype)
    d_inp = jnp.einsum(
        "btuv,hv->btuh", gc, w, preferred_element_type=jnp.float32
    ).astype(inp.dtype)
    d_w = jnp.einsum(
        "btuh,btuv->hv", inp, gc, preferred_element_type=jnp.float32
    ).astype(w.dtype)
    return d_inp, d_w


_joint_dot_shared.defvjp(_joint_dot_shared_fwd, _joint_dot_shared_bwd)


@jax.custom_vjp
def _joint_dot_split_shared(inp, w_lab, w_blank):
    """Uniform-language variant of _joint_dot_split (shared [H, V] label
    block + [H] blank vector). See _joint_dot_shared for why."""
    lab = jnp.einsum(
        "btuh,hv->btuv", inp, w_lab, preferred_element_type=jnp.float32
    )
    blk = jnp.einsum(
        "btuh,h->btu", inp, w_blank, preferred_element_type=jnp.float32
    )
    return lab, blk


def _joint_dot_split_shared_fwd(inp, w_lab, w_blank):
    return (
        _joint_dot_split_shared(inp, w_lab, w_blank),
        (inp, w_lab, w_blank),
    )


def _joint_dot_split_shared_bwd(res, g):
    inp, w_lab, w_blank = res
    gl = g[0].astype(inp.dtype)
    gb = g[1].astype(inp.dtype)
    d_inp = (
        jnp.einsum(
            "btuv,hv->btuh", gl, w_lab, preferred_element_type=jnp.float32
        )
        + gb[..., None].astype(jnp.float32)
        * w_blank[None, None, None, :].astype(jnp.float32)
    ).astype(inp.dtype)
    d_w_lab = jnp.einsum(
        "btuh,btuv->hv", inp, gl, preferred_element_type=jnp.float32
    ).astype(w_lab.dtype)
    d_w_blank = jnp.einsum(
        "btuh,btu->h", inp, gb, preferred_element_type=jnp.float32
    ).astype(w_blank.dtype)
    return d_inp, d_w_lab, d_w_blank


_joint_dot_split_shared.defvjp(
    _joint_dot_split_shared_fwd, _joint_dot_split_shared_bwd
)


def _chunk_logprob_slabs(
    f_chunk, g_proj, head_w, head_b, labels_pad, blank, activation,
    dropout_rate, dropout_key, uniform_head=False,
):
    """[B, Tc, H] -> (lp_blank [B, Tc, U+1], lp_label [B, Tc, U+1]).

    ``uniform_head``: every batch row uses the SAME language head — the
    reference's CL drivers train exactly one language per task
    (cl_baseline.py per-task manifests), so this is the training-path
    common case. head_w[0]/head_b[0] are used for the whole batch, and
    the joint dots become single shared-weight matmuls instead of B
    per-sample ones (the per-sample batched form measured ~50-60% MXU
    efficiency in the op profile). Gradients stay exact: d(head)[0] flows
    back through the caller's jnp.take gather into the one language row,
    which under a uniform batch equals the sum the per-sample path
    scatters."""
    inp = _activate(
        f_chunk[:, :, None, :] + g_proj[:, None, :, :], activation
    )  # [B, Tc, U+1, H]
    if dropout_rate > 0.0 and dropout_key is not None:
        # 8-bit mask draw (utils/rng.py): bernoulli's uniform-f32 was
        # ~131 MB of RngBitGenerator output per chunk at flagship
        keep = dropout_keep_mask(dropout_key, dropout_rate, inp.shape)
        # save the (packed bool) mask across the remat boundary: without
        # this the backward re-runs the rng-bit-generator + compare per
        # chunk (~1.5 ms/step at flagship in the op profile) to rebuild
        # a mask that costs a fraction of that to store
        keep = checkpoint_name(keep, "joint_dropout_mask")
        inp = jnp.where(keep, inp / (1.0 - dropout_rate), 0.0)
    # head_w is the raw f32 parameter gather; cast it to the compute dtype
    # (bf16 at flagship) so the joint matmul — the largest FLOP block in
    # the loss path — runs MXU-native with f32 ACCUMULATION instead of
    # being silently promoted to an all-f32 dot (half MXU rate; found by
    # auditing the lowered HLO's dot_general dtypes). log_softmax and the
    # lattice stay f32; the custom VJPs keep the backward dots in the
    # compute dtype too.
    V1 = head_w.shape[-1]
    w = head_w.astype(inp.dtype)
    if uniform_head:
        w = w[0]  # [H, V+1]; grad scatters into row 0 -> the task's lang
        head_b = head_b[0]  # [V+1]
    if blank == V1 - 1 and uniform_head:
        logits_lab, logit_blank = _joint_dot_split_shared(
            inp, w[..., :blank], w[..., blank]
        )
        logits_lab = checkpoint_name(
            logits_lab + head_b[:blank], "joint_logits"
        )
        logit_blank = checkpoint_name(
            logit_blank + head_b[blank], "joint_logits"
        )
        m_lab = jax.lax.stop_gradient(jnp.max(logits_lab, axis=-1))
        m = jax.lax.stop_gradient(jnp.maximum(m_lab, logit_blank))
        lse = m + jnp.log(
            jnp.sum(jnp.exp(logits_lab - m[..., None]), axis=-1)
            + jnp.exp(logit_blank - m)
        )
        lp_blank = logit_blank - lse
        onehot = jax.nn.one_hot(
            labels_pad.astype(jnp.int32), blank, dtype=logits_lab.dtype
        )
        lp_label = (
            jnp.einsum(
                "btuv,buv->btu", logits_lab, onehot,
                preferred_element_type=jnp.float32,
            )
            - lse
        )
        return lp_blank, lp_label
    if blank == V1 - 1:
        # Blank-column split (see _joint_dot_split): labels V=V1-1 tile
        # the MXU lanes exactly at flagship (256 = 2x128) instead of
        # padding V+1=257 to 384. The reference's per-language heads put
        # blank last by construction (models/rnnt.py blank_local; NeMo
        # hybrid_rnnt_ctc_bpe_models.py:102-134 num_classes // n_langs).
        logits_lab, logit_blank = _joint_dot_split(
            inp, w[..., :blank], w[..., blank]
        )
        logits_lab = checkpoint_name(
            logits_lab + head_b[:, None, None, :blank], "joint_logits"
        )
        logit_blank = checkpoint_name(
            logit_blank + head_b[:, None, None, blank], "joint_logits"
        )
        # The slabs need only logsumexp + two gathered logits; a full
        # log_softmax would materialize another [B, Tc, U+1, V+1] f32
        # tensor (~100 MB/chunk at flagship, again in the remat
        # recompute) just to read 2 of its V+1 columns.
        m_lab = jax.lax.stop_gradient(jnp.max(logits_lab, axis=-1))
        m = jax.lax.stop_gradient(jnp.maximum(m_lab, logit_blank))
        lse = m + jnp.log(
            jnp.sum(jnp.exp(logits_lab - m[..., None]), axis=-1)
            + jnp.exp(logit_blank - m)
        )  # [B, Tc, U+1]
        lp_blank = logit_blank - lse
        # label column via a ONE-HOT contraction instead of
        # take_along_axis: the gather's backward is a scatter-add the op
        # profile measured at 9 GB/s; as a dot both directions ride the
        # MXU. Labels are local ids < blank, so V columns suffice.
        onehot = jax.nn.one_hot(
            labels_pad.astype(jnp.int32), blank, dtype=logits_lab.dtype
        )  # [B, U+1, V]
        lp_label = (
            jnp.einsum(
                "btuv,buv->btu", logits_lab, onehot,
                preferred_element_type=jnp.float32,
            )
            - lse
        )
        return lp_blank, lp_label
    if uniform_head:
        logits = _joint_dot_shared(inp, w) + head_b
    else:
        logits = _joint_dot(inp, w) + head_b[:, None, None, :]
    logits = checkpoint_name(logits, "joint_logits")
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    lse = m[..., 0] + jnp.log(
        jnp.sum(jnp.exp(logits - m), axis=-1)
    )  # [B, Tc, U+1]
    lp_blank = logits[..., blank] - lse
    onehot = jax.nn.one_hot(
        labels_pad.astype(jnp.int32), V1, dtype=logits.dtype
    )  # [B, U+1, V+1]
    lp_label = (
        jnp.einsum(
            "btuv,buv->btu", logits, onehot,
            preferred_element_type=jnp.float32,
        )
        - lse
    )
    return lp_blank, lp_label


def rnnt_loss_fused(
    f_proj: jnp.ndarray,     # [B, T, H] encoder-side joint projection
    g_proj: jnp.ndarray,     # [B, U+1, H] prediction-side joint projection
    head_w: jnp.ndarray,     # [B, H, V+1] per-sample language head kernel
    head_b: jnp.ndarray,     # [B, V+1] per-sample language head bias
    labels: jnp.ndarray,     # [B, U]
    frame_lens: jnp.ndarray,
    label_lens: jnp.ndarray,
    *,
    blank: int,
    activation: str = "relu",
    reduction: str = "mean_batch",
    chunk_size: int = 64,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    impl: str = "xla",  # "xla" | "pallas" (fused joint kernel, relu only)
    row_mask: jnp.ndarray | None = None,  # bool [B]: real (non-repeat) rows
    uniform_head: bool = False,  # all rows share head_w[0]/head_b[0]
    remat: str = "full",  # "full" | "save_logits" | "none"
):
    B, T, H = f_proj.shape
    U1 = g_proj.shape[1]
    labels_pad = jnp.concatenate(
        [labels, jnp.zeros((B, 1), labels.dtype)], axis=1
    )

    if impl in ("pallas", "pallas_interpret") and activation == "relu":
        from .joint_fused_pallas import joint_slabs_pallas

        if remat != "full":
            # the Pallas joint has its own fixed chunking/recompute
            # schedule; the remat knob does not apply to it (ADVICE r4)
            warnings.warn(
                f"rnnt_remat={remat!r} has no effect with the pallas "
                "joint impl: the fused kernel always recomputes per "
                "Tc=16 chunk (its own VMEM schedule). A/B the remat "
                "knob with impl='xla'.",
                stacklevel=2,
            )

        if dropout_rng is not None and dropout_rate > 0.0:
            seed = jax.random.randint(
                dropout_rng, (1,), 0, 2**31 - 1, dtype=jnp.int32
            )
        else:
            seed = jnp.zeros((1,), jnp.int32)
        # The backward kernel holds inp [Tc,U1,H] + logits + dlogits +
        # d_inp in VMEM at once; Tc=64 blows the 16 MiB scoped-vmem stack
        # at flagship H=640/V1=257 (measured: 19.59M requested on v5e).
        # Tc=16 keeps every temporary under ~7 MiB. Fwd/bwd MUST share the
        # chunking: dropout masks are seeded per (batch, chunk) index.
        pallas_chunk = min(chunk_size, 16)
        lp_blank, lp_label = joint_slabs_pallas(
            f_proj, g_proj, head_w, head_b, labels_pad, seed,
            blank, pallas_chunk, dropout_rate,
            impl == "pallas_interpret",
        )
        nll = rnnt_nll_from_logprobs(
            lp_blank, lp_label, frame_lens.astype(jnp.int32),
            label_lens.astype(jnp.int32),
        )
        return _reduce(nll, label_lens, reduction, row_mask)

    n_chunks = -(-T // chunk_size)
    T_pad = n_chunks * chunk_size
    if T_pad != T:
        f_proj = jnp.pad(f_proj, ((0, 0), (0, T_pad - T), (0, 0)))

    f_chunks = f_proj.reshape(B, n_chunks, chunk_size, H).swapaxes(0, 1)

    # Remat policy for the chunk bodies (hardware-A/B knob, docs/PERF.md):
    #   "full"        — save only the dropout mask; backward recomputes the
    #                   activated joint input AND the head dot per chunk
    #                   (minimum memory: one chunk of logits live, any T);
    #   "save_logits" — additionally store each chunk's f32 logits, so the
    #                   backward skips re-running the largest FLOP block
    #                   (the head dot) and only rebuilds the elementwise
    #                   input chain (needed for d_w anyway). Extra
    #                   residency: [B, T, U+1, V] f32 (~160 MB at the
    #                   flagship working point — fine in 16 GB HBM);
    #   "none"        — no jax.checkpoint: XLA keeps whatever residuals it
    #                   wants (both `inp` and the logits stay live).
    base_fn = functools.partial(
        _chunk_logprob_slabs,
        blank=blank,
        activation=activation,
        dropout_rate=dropout_rate,
        uniform_head=uniform_head,
    )
    if remat == "none":
        # Guard the bounded-memory property the chunked joint exists for
        # (ADVICE r4): with no checkpoint, XLA keeps both the activated
        # joint input [B,T,U+1,H] (param dtype) and the f32 logits
        # [B,T,U+1,V+1] live for the backward. Estimate that residency
        # and fall back to "full" (chunk-bounded) when it exceeds the
        # threshold — long-utterance / large-batch configs must not
        # silently inherit multi-GB residuals.
        V1 = head_b.shape[-1]
        resid_gb = (
            B * T_pad * U1 * (H * f_proj.dtype.itemsize + V1 * 4) / 2**30
        )
        limit_gb = float(os.environ.get("RNNT_REMAT_NONE_LIMIT_GB", "4"))
        if resid_gb > limit_gb:
            warnings.warn(
                f"rnnt_remat='none' would keep ~{resid_gb:.1f} GB of "
                f"joint residuals live (B={B}, T={T_pad}, U+1={U1}, "
                f"V+1={V1}) > {limit_gb:.0f} GB limit; falling back to "
                "'full' chunk remat. Raise RNNT_REMAT_NONE_LIMIT_GB to "
                "override.",
                stacklevel=2,
            )
            remat = "full"
    if remat == "none":
        chunk_fn = base_fn
    else:
        saved = ("joint_dropout_mask",)
        if remat == "save_logits":
            saved = saved + ("joint_logits",)
        elif remat != "full":
            raise ValueError(f"remat mode {remat!r}")
        chunk_fn = jax.checkpoint(
            base_fn,
            policy=jax.checkpoint_policies.save_only_these_names(*saved),
        )

    def body(i, f_chunk):
        key = (
            jax.random.fold_in(dropout_rng, i)
            if (dropout_rng is not None and dropout_rate > 0.0)
            else None
        )
        return chunk_fn(
            f_chunk, g_proj, head_w, head_b, labels_pad, dropout_key=key
        )

    # UNROLLED python loop over the (static, small — T/Tc ~ 4 at flagship)
    # chunk count: lax.map's while-loop carries cost ~1.2 ms/step of pure
    # copies in the op profile; unrolling removes them (program size grows
    # by n_chunks joint bodies, which the scanned encoder dwarfs anyway)
    pieces = [body(i, f_chunks[i]) for i in range(n_chunks)]
    lp_blank = jnp.concatenate(
        [p[0] for p in pieces], axis=1
    )[:, :T]
    lp_label = jnp.concatenate(
        [p[1] for p in pieces], axis=1
    )[:, :T]

    nll = rnnt_nll_from_logprobs(
        lp_blank, lp_label, frame_lens.astype(jnp.int32),
        label_lens.astype(jnp.int32),
    )
    return _reduce(nll, label_lens, reduction, row_mask)
