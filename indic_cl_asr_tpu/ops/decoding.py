"""Greedy CTC and batched greedy RNNT decoding under jit.

Functional spec: the reference's greedy decoders
(reference: NeMo parts/submodules/ctc_greedy_decoding.py:58-270
`GreedyCTCInfer` — argmax, collapse repeats, drop blanks;
rnnt_greedy_decoding.py:518-1010 `GreedyBatchedRNNTInfer`
`_greedy_decode_blank_as_pad_loop_frames` — per-frame inner symbol loop
bounded by `max_symbols`, batched prediction-net state with
emit-masked updates).

TPU-first design: everything is static-shape. The RNNT decode is a
`lax.scan` over frames whose inner symbol loop is a `lax.while_loop`
that exits as soon as every sequence in the batch has emitted blank —
the common all-blank frame costs ONE prediction-net step, matching the
GPU implementation's early-exit behavior without host sync.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def ctc_greedy_decode(
    log_probs: jnp.ndarray,  # [B, T, V+1], blank LAST
    frame_lens: jnp.ndarray,
    blank: int | None = None,
):
    """-> (ids [B, T] padded with blank, lens [B]) after collapse+deblank."""
    B, T, V1 = log_probs.shape
    if blank is None:
        blank = V1 - 1
    ids = jnp.argmax(log_probs, axis=-1)  # [B, T]
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    valid = t_iota < frame_lens[:, None]
    prev = jnp.concatenate(
        [jnp.full((B, 1), blank, ids.dtype), ids[:, :-1]], axis=1
    )
    keep = valid & (ids != blank) & (ids != prev)
    # stable compaction: the k-th kept token lands at output position k
    pos = jnp.cumsum(keep, axis=1) - 1  # position for kept tokens
    b_iota = jax.lax.broadcasted_iota(jnp.int32, (B, T), 0)
    out = jnp.full((B, T), blank, ids.dtype)
    out = out.at[b_iota, jnp.where(keep, pos, T)].set(
        jnp.where(keep, ids, blank), mode="drop"
    )  # non-kept tokens target index T: out-of-bounds, dropped
    lens = keep.sum(axis=1).astype(jnp.int32)
    # mask anything at/after each row's length back to blank (a dropped
    # non-kept write can only have targeted position -1, which 'drop'
    # discards, so this is belt-and-braces for the pos==-1, keep=False rows)
    out = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (B, T), 1) < lens[:, None],
        out, blank,
    )
    return out, lens


def rnnt_greedy_decode(
    f_proj: jnp.ndarray,      # [B, T, H] encoder-side joint projections
    frame_lens: jnp.ndarray,  # [B]
    lang_ids: jnp.ndarray,    # [B]
    pred_step: Callable,      # (last_label [B], state) -> (g_proj [B,H], state)
    joint_step: Callable,     # (f_t [B,H], g_t [B,H], lang_ids) -> [B, V+1]
    init_state,
    *,
    blank: int,
    max_symbols: int = 10,
    max_out: int = 256,
    carry=None,               # continuation from a previous chunk (streaming)
    t_offset: int | jnp.ndarray = 0,  # absolute index of f_proj[:, 0]
    return_carry: bool = False,
):
    """Batched greedy transducer decode -> (ids [B, max_out], lens [B]).

    Streaming continuation: pass ``carry=`` the value returned with
    ``return_carry=True`` from the previous chunk and ``t_offset=`` the
    absolute frame index of this chunk's first frame; the token buffer,
    last label and prediction-net state continue across chunks, so
    chunk-by-chunk decoding of an encoder stream equals one offline decode
    over the concatenated frames."""
    B, T, H = f_proj.shape

    if carry is None:
        # the prediction-net output for the current last_label is cached
        # and only recomputed after an emission (one pred step per frame
        # when the frame is all-blank)
        g0, state0 = pred_step(jnp.full((B,), blank, jnp.int32), init_state)
        carry = (
            jnp.full((B, max_out), blank, jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.full((B,), blank, jnp.int32),
            g0, state0,
        )

    def frame(carry, xs):
        out, out_len, last_label, g, state = carry
        f_t, t = xs
        frame_active = t < frame_lens  # [B]

        def cond(inner):
            k, _, _, _, _, _, cont = inner
            return (k < max_symbols) & jnp.any(cont)

        def body(inner):
            k, out, out_len, last_label, g, state, cont = inner
            logits = joint_step(f_t, g, lang_ids)  # [B, V+1]
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emit = cont & (pred != blank) & (out_len < max_out)
            # scatter emitted symbols at out_len
            b_iota = jnp.arange(B)
            out = out.at[b_iota, jnp.clip(out_len, 0, max_out - 1)].set(
                jnp.where(emit, pred, out[b_iota, jnp.clip(out_len, 0, max_out - 1)])
            )
            out_len = out_len + emit.astype(jnp.int32)
            new_last = jnp.where(emit, pred, last_label)
            g_new, state_new = pred_step(new_last, state)
            sel = emit
            g = jnp.where(sel[:, None], g_new, g)
            state = jax.tree.map(
                lambda new, old: jnp.where(
                    sel.reshape((B,) + (1,) * (new.ndim - 1)), new, old
                ),
                state_new, state,
            )
            cont = cont & emit
            return k + 1, out, out_len, new_last, g, state, cont

        init = (0, out, out_len, last_label, g, state, frame_active)
        _, out, out_len, last_label, g, state, _ = jax.lax.while_loop(
            cond, body, init
        )
        return (out, out_len, last_label, g, state), None

    final_carry, _ = jax.lax.scan(
        frame, carry,
        (jnp.swapaxes(f_proj, 0, 1), t_offset + jnp.arange(T)),
    )
    out, out_len = final_carry[0], final_carry[1]
    if return_carry:
        return out, out_len, final_carry
    return out, out_len


def rnnt_greedy_decode_labelsync(
    f_proj: jnp.ndarray,      # [B, T, H]
    frame_lens: jnp.ndarray,  # [B]
    lang_ids: jnp.ndarray,    # [B]
    pred_step: Callable,
    joint_step: Callable,
    init_state,
    *,
    blank: int,
    max_symbols: int = 10,
    max_out: int = 256,
    window: int = 32,
):
    """Label-looping batched greedy decode — same output as
    `rnnt_greedy_decode`, restructured so sequential work scales with the
    number of EMITTED tokens, not frames (the reference's loop-labels
    batched decoder family, rnnt_greedy_decoding.py:518 spec).

    Each round evaluates the joint over a WINDOW of frames against the
    current (fixed) prediction-net output — one [B, W, H] x [H, V] MXU
    matmul — and jumps straight to the first non-blank frame. Blank
    stretches cost one round per `window` frames and ZERO prediction-net
    steps; a pred step runs only after an emission. Typical rounds:
    U + T/window vs the frame-synchronous decoder's T.
    """
    B, T, H = f_proj.shape
    W = min(window, T)
    # vectorize the per-frame joint over the window dimension
    joint_win = jax.vmap(joint_step, in_axes=(1, None, None), out_axes=1)

    g0, state0 = pred_step(jnp.full((B,), blank, jnp.int32), init_state)
    f_pad = jnp.pad(f_proj, ((0, 0), (0, W), (0, 0)))

    def tree_where(sel, new, old):
        return jax.tree.map(
            lambda n, o: jnp.where(
                sel.reshape((B,) + (1,) * (n.ndim - 1)), n, o
            ),
            new, old,
        )

    def cond(c):
        it = c[0]
        t_ptr = c[1]
        return (it < T + max_out) & jnp.any(t_ptr < frame_lens)

    def body(c):
        (it, t_ptr, out, out_len, last_label, g, state, sym_count,
         last_t) = c
        idx = t_ptr[:, None] + jnp.arange(W)[None]           # [B, W]
        f_win = jnp.take_along_axis(f_pad, idx[..., None], axis=1)
        logits = joint_win(f_win, g, lang_ids)               # [B, W, V1]
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        valid_w = idx < frame_lens[:, None]
        nonblank = (pred != blank) & valid_w
        has_nb = jnp.any(nonblank, axis=1)
        w_star = jnp.argmax(nonblank, axis=1)
        n_valid = jnp.sum(valid_w, axis=1).astype(jnp.int32)

        active = t_ptr < frame_lens
        t_emit = t_ptr + w_star
        label = jnp.take_along_axis(pred, w_star[:, None], axis=1)[:, 0]

        # per-frame symbol budget (frame-sync max_symbols semantics)
        new_sym = jnp.where(t_emit == last_t, sym_count + 1, 1)
        budget_ok = new_sym <= max_symbols
        cap_ok = out_len < max_out
        emit = active & has_nb & budget_ok & cap_ok
        forced_adv = active & has_nb & ~(budget_ok & cap_ok)

        b_iota = jnp.arange(B)
        pos = jnp.clip(out_len, 0, max_out - 1)
        out = out.at[b_iota, pos].set(
            jnp.where(emit, label, out[b_iota, pos])
        )
        out_len = out_len + emit.astype(jnp.int32)

        new_last = jnp.where(emit, label, last_label)
        g_new, state_new = pred_step(new_last, state)
        g = jnp.where(emit[:, None], g_new, g)
        state = tree_where(emit, state_new, state)

        t_next = jnp.where(
            emit, t_emit,
            jnp.where(
                forced_adv, t_emit + 1, t_ptr + jnp.maximum(n_valid, 1)
            ),
        )
        t_next = jnp.where(active, t_next, t_ptr)
        sym_count = jnp.where(emit, new_sym, jnp.zeros_like(sym_count))
        last_t = jnp.where(emit, t_emit, jnp.full_like(last_t, -1))
        return (it + 1, t_next, out, out_len, new_last, g, state,
                sym_count, last_t)

    out0 = jnp.full((B, max_out), blank, jnp.int32)
    c0 = (
        jnp.int32(0), jnp.zeros((B,), jnp.int32), out0,
        jnp.zeros((B,), jnp.int32), jnp.full((B,), blank, jnp.int32),
        g0, state0, jnp.zeros((B,), jnp.int32),
        jnp.full((B,), -1, jnp.int32),
    )
    c = jax.lax.while_loop(cond, body, c0)
    return c[2], c[3]
