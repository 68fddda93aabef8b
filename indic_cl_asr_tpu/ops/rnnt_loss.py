"""RNN-Transducer loss — TPU-native lattice with a custom VJP.

Functional spec: the reference's numba-CUDA wavefront kernels
(reference: NeMo parts/numba/rnnt_loss/utils/cuda_utils/gpu_rnnt_kernel.py:
74/176/273 compute_alphas/betas/grad, gpu_rnnt.py:41-343 orchestration,
rnnt_pytorch.py:40-99 autograd glue). The TPU design is different:

  * the DP never touches the vocab axis — the joint log-probs are reduced
    up-front to TWO [B, T, U+1] tensors (blank and target-label
    log-probs), so the lattice is pure VPU work over [B, T, U] and the
    gradient to the full [B, T, U, V] logits flows through the
    gather/log_softmax by ordinary autodiff (this also realizes the
    reference's log-softmax denominator trick, gpu_rnnt.py:93, for free);
  * alpha rows are computed by a `lax.scan` over T where each row's
    within-row recurrence (a first-order linear recurrence in log space)
    is evaluated with `lax.associative_scan` — O(log U) depth, fully
    vectorized across (B, U) — instead of the GPU's one-block-per-sample
    wavefront;
  * variable lengths use the free-blank padding trick: padded frames emit
    blank with probability 1 and padded labels are impossible, so the
    padded-lattice corner equals the true-lattice corner; no dynamic
    shapes anywhere;
  * backward recomputes beta (cheap, same scan) and applies the occupancy
    formula, masked to the real lattice.

Reduction semantics match the reference: per-sample NLL, `mean_batch` =
plain mean over the batch (losses/rnnt.py:398-434).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-but-finite to keep arithmetic NaN-free


def _to_diagonals(x: jnp.ndarray, fill: float) -> jnp.ndarray:
    """[B, T, U1] -> [B, T+U1-1, U1] with out[b, d, u] = x[b, d-u, u]
    (anti-diagonal-major layout; invalid (d-u) slots get ``fill``).
    Index matrices are built from on-device iotas (NOT host constants:
    embedded [D, U1] i32 literals bloat the serialized program that the
    tunneled remote-compile service caps), fused into one gather."""
    B, T, U1 = x.shape
    D = T + U1 - 1
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (D, U1), 0)
    u_idx = jax.lax.broadcasted_iota(jnp.int32, (D, U1), 1)
    t_idx = d_idx - u_idx                       # [D, U1]
    valid = (t_idx >= 0) & (t_idx < T)
    t_safe = jnp.clip(t_idx, 0, T - 1)
    out = x[:, t_safe, u_idx]                   # [B, D, U1]
    return jnp.where(valid[None], out, fill)


def _from_diagonals(xd: jnp.ndarray, T: int) -> jnp.ndarray:
    """Inverse of _to_diagonals: [B, D, U1] -> [B, T, U1]."""
    B, D, U1 = xd.shape
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (T, U1), 0)
    u_idx = jax.lax.broadcasted_iota(jnp.int32, (T, U1), 1)
    return xd[:, t_idx + u_idx, u_idx]


def _prepare(lp_blank, lp_label, t_lens, u_lens):
    """Apply the free-blank / impossible-label padding masks."""
    B, T, U1 = lp_blank.shape
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (B, T, U1), 1)
    u_idx = jax.lax.broadcasted_iota(jnp.int32, (B, T, U1), 2)
    t_valid = t_idx < t_lens[:, None, None]
    label_valid = t_valid & (u_idx < u_lens[:, None, None])
    lpb = jnp.where(t_valid, lp_blank, 0.0)
    lpl = jnp.where(label_valid, lp_label, NEG_INF)
    return lpb, lpl, t_valid, label_valid


# lattice backend: "scan" (default) or "pallas". Measured on v5e
# (B16 T204 U49, fwd+bwd): scan 2.05 ms, pallas 2.27 ms — the cost is the
# diagonal-slab HBM traffic, not scan dispatch, so the portable scan stays
# default; the kernels remain available and hardware-validated.
LATTICE_IMPL: str | None = None


def _use_pallas() -> bool:
    return LATTICE_IMPL == "pallas"


def _shift_right(x, fill=NEG_INF):
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (1,), fill, x.dtype), x[..., :-1]], axis=-1
    )


def _shift_left(x, fill=NEG_INF):
    return jnp.concatenate(
        [x[..., 1:], jnp.full(x.shape[:-1] + (1,), fill, x.dtype)], axis=-1
    )


def _alpha(lpb, lpl):
    """Forward lattice — Pallas kernel on TPU, lax.scan elsewhere."""
    B, T, U1 = lpb.shape
    if _use_pallas():
        from .rnnt_loss_pallas import alpha_diagonals_pallas

        lpb_d = _to_diagonals(lpb, NEG_INF)
        lpl_d = _to_diagonals(lpl, NEG_INF)
        alpha_d = alpha_diagonals_pallas(lpb_d, lpl_d)
        return _from_diagonals(alpha_d, T)
    return _alpha_scan(lpb, lpl)


def _beta(lpb, lpl, u_lens):
    """Backward lattice (extended with the exit row) — Pallas on TPU."""
    B, T, U1 = lpb.shape
    if _use_pallas():
        from .rnnt_loss_pallas import beta_diagonals_pallas

        pad_row = jnp.full((B, 1, U1), NEG_INF, lpb.dtype)
        lpb_e = jnp.concatenate([lpb, pad_row], axis=1)
        lpl_e = jnp.concatenate([lpl, pad_row], axis=1)
        beta_d = beta_diagonals_pallas(
            _to_diagonals(lpb_e, NEG_INF), _to_diagonals(lpl_e, NEG_INF),
            u_lens, T,
        )
        return _from_diagonals(beta_d, T + 1)
    return _beta_scan(lpb, lpl, u_lens)


def _alpha_scan(lpb, lpl):
    """Forward lattice by anti-diagonal wavefront.

    Both of alpha[t,u]'s predecessors — blank (t-1,u) and label (t,u-1) —
    live on diagonal d-1 = t+u-1, so the scan body is two adds, one shift
    and one logaddexp over [B, U1]: trivially cheap to compile and to run,
    unlike the GPU reference's per-block wavefront threads.

    Returns alpha [B, T, U+1] (alpha[0,0] = 0).
    """
    B, T, U1 = lpb.shape
    lpb_d = _to_diagonals(lpb, NEG_INF)  # [B, D, U1], D = T+U1-1
    lpl_d = _to_diagonals(lpl, NEG_INF)

    alpha0 = jnp.full((B, U1), NEG_INF, lpb.dtype).at[:, 0].set(0.0)

    def step(alpha_prev, xs):
        lpb_prev, lpl_prev = xs  # diagonal d-1 entries
        blank = alpha_prev + lpb_prev
        label = _shift_right(alpha_prev + lpl_prev)
        alpha_d = jnp.logaddexp(blank, label)
        return alpha_d, alpha_d

    xs = (
        jnp.swapaxes(lpb_d, 0, 1)[:-1],  # diagonals 0..D-2 feed 1..D-1
        jnp.swapaxes(lpl_d, 0, 1)[:-1],
    )
    # unroll: the per-iteration while-loop bookkeeping dominates these
    # tiny [B, U1] row updates; 4x unrolling quarters it (same math)
    _, rest = jax.lax.scan(step, alpha0, xs, unroll=4)
    alpha_d = jnp.concatenate([alpha0[None], rest], axis=0)  # [D, B, U1]
    return _from_diagonals(jnp.swapaxes(alpha_d, 0, 1), T)


def _beta_scan(lpb, lpl, u_lens):
    """Backward lattice by anti-diagonal wavefront, on a lattice extended
    with a virtual exit row t = T where beta[T, u] = 0 iff u == u_len
    (the free-blank padding trick's exit). Returns beta_ext [B, T+1, U+1];
    beta_ext[:, 0, 0] is log Z.
    """
    B, T, U1 = lpb.shape
    pad_row = jnp.full((B, 1, U1), NEG_INF, lpb.dtype)
    lpb_e = jnp.concatenate([lpb, pad_row], axis=1)  # [B, T+1, U1]
    lpl_e = jnp.concatenate([lpl, pad_row], axis=1)
    lpb_d = jnp.swapaxes(_to_diagonals(lpb_e, NEG_INF), 0, 1)  # [D', B, U1]
    lpl_d = jnp.swapaxes(_to_diagonals(lpl_e, NEG_INF), 0, 1)
    D = T + U1  # diagonals of the extended lattice

    u_iota = jax.lax.broadcasted_iota(jnp.int32, (B, U1), 1)
    exit_row = jnp.where(u_iota == u_lens[:, None], 0.0, NEG_INF)

    def step(beta_next, xs):
        lpb_row, lpl_row, d = xs  # entries of diagonal d
        blank = lpb_row + beta_next
        label = lpl_row + _shift_left(beta_next)
        cand = jnp.logaddexp(blank, label)
        # boundary: cells with t = d - u == T take the exit value
        exit_here = (d - u_iota) == T
        beta_d = jnp.where(exit_here, exit_row, cand)
        return beta_d, beta_d

    ds = jnp.arange(D - 2, -1, -1)  # scan diagonals D-2 .. 0
    beta_last = jnp.where((D - 1 - u_iota) == T, exit_row, NEG_INF)
    _, rest = jax.lax.scan(
        step, beta_last, (lpb_d[ds], lpl_d[ds], ds), unroll=4
    )
    # rest holds diagonals D-2..0; assemble [D, B, U1] in ascending order
    beta_d_all = jnp.concatenate(
        [jnp.flip(rest, 0), beta_last[None]], axis=0
    )
    return _from_diagonals(jnp.swapaxes(beta_d_all, 0, 1), T + 1)


@jax.custom_vjp
def rnnt_nll_from_logprobs(lp_blank, lp_label, t_lens, u_lens):
    """Per-sample RNNT negative log-likelihood.

    lp_blank: [B, T, U+1] log p(blank | t, u)
    lp_label: [B, T, U+1] log p(y_{u+1} | t, u) (column U ignored)
    t_lens:   [B] valid encoder frames;  u_lens: [B] valid labels
    """
    nll, _ = _forward(lp_blank, lp_label, t_lens, u_lens)
    return nll


def _forward(lp_blank, lp_label, t_lens, u_lens):
    lpb, lpl, _, _ = _prepare(lp_blank, lp_label, t_lens, u_lens)
    alpha = _alpha(lpb, lpl)
    # corner: padded frames contribute free blanks, so row T-1 is exact
    alpha_final = jnp.take_along_axis(
        alpha[:, -1, :], u_lens[:, None], axis=1
    )[:, 0]
    lpb_final = jnp.take_along_axis(
        lpb[:, -1, :], u_lens[:, None], axis=1
    )[:, 0]
    return -(alpha_final + lpb_final), alpha


def _fwd(lp_blank, lp_label, t_lens, u_lens):
    nll, alpha = _forward(lp_blank, lp_label, t_lens, u_lens)
    return nll, (lp_blank, lp_label, t_lens, u_lens, alpha, nll)


def _bwd(res, g):
    lp_blank, lp_label, t_lens, u_lens, alpha, nll = res
    lpb, lpl, t_valid, label_valid = _prepare(
        lp_blank, lp_label, t_lens, u_lens
    )
    B, T, U1 = lpb.shape
    beta_ext = _beta(lpb, lpl, u_lens)  # [B, T+1, U1], row T = exit
    logZ = -nll  # == beta_ext[:, 0, 0]

    beta_tnext = beta_ext[:, 1:]  # beta[t+1, u] incl. virtual exit row
    beta_unext = jnp.concatenate(
        [beta_ext[:, :T, 1:], jnp.full((B, T, 1), NEG_INF)], axis=2
    )  # beta[t, u+1]

    occ_blank = -jnp.exp(
        alpha + lpb + beta_tnext - logZ[:, None, None]
    )
    occ_label = -jnp.exp(
        alpha + lpl + beta_unext - logZ[:, None, None]
    )
    g3 = g[:, None, None]
    d_blank = jnp.where(t_valid, occ_blank, 0.0) * g3
    d_label = jnp.where(label_valid, occ_label, 0.0) * g3
    return d_blank, d_label, None, None


rnnt_nll_from_logprobs.defvjp(_fwd, _bwd)


def gather_blank_and_label_logprobs(log_probs, labels, blank: int):
    """[B, T, U+1, V] + [B, U] -> (lp_blank, lp_label) both [B, T, U+1]."""
    lp_blank = log_probs[..., blank]
    B, T, U1, V = log_probs.shape
    labels_pad = jnp.concatenate(
        [labels, jnp.zeros((B, 1), labels.dtype)], axis=1
    )  # column U never used (masked by u_lens)
    lp_label = jnp.take_along_axis(
        log_probs, labels_pad[:, None, :, None].astype(jnp.int32), axis=3
    )[..., 0]
    return lp_blank, lp_label


def rnnt_loss(
    logits: jnp.ndarray,     # [B, T, U+1, V] raw joint logits
    labels: jnp.ndarray,     # [B, U] local token ids
    frame_lens: jnp.ndarray, # [B]
    label_lens: jnp.ndarray, # [B]
    blank: int,
    reduction: str = "mean_batch",
):
    """RNNT loss over materialized joint logits (test/medium-size path;
    the fused streaming path lives in ops/rnnt_loss_fused.py)."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp_blank, lp_label = gather_blank_and_label_logprobs(
        log_probs, labels, blank
    )
    nll = rnnt_nll_from_logprobs(
        lp_blank, lp_label, frame_lens.astype(jnp.int32),
        label_lens.astype(jnp.int32),
    )
    return _reduce(nll, label_lens, reduction)


def _reduce(nll, label_lens, reduction: str, row_mask=None):
    """Reduce per-row NLLs. ``row_mask`` (bool [B]) marks REAL rows; padded
    repeat rows (data/pipeline.py pads the final partial bucket batch by
    repeating its last row) are excluded so reductions match the reference's
    smaller-final-batch semantics (audio_to_text.py:57-116)."""
    if reduction is None or reduction == "none":
        return nll
    if row_mask is None:
        if reduction == "mean_batch":
            return jnp.mean(nll)
        if reduction == "sum":
            return jnp.sum(nll)
        if reduction == "mean":
            return jnp.mean(nll / jnp.maximum(label_lens, 1))
        if reduction == "mean_volume":
            return jnp.sum(nll) / jnp.maximum(jnp.sum(label_lens), 1)
        raise ValueError(reduction)
    nll = jnp.where(row_mask, nll, 0.0)
    n = jnp.maximum(jnp.sum(row_mask.astype(nll.dtype)), 1.0)
    if reduction == "mean_batch":
        return jnp.sum(nll) / n
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.sum(nll / jnp.maximum(label_lens, 1)) / n
    if reduction == "mean_volume":
        tok = jnp.sum(jnp.where(row_mask, label_lens, 0))
        return jnp.sum(nll) / jnp.maximum(tok, 1)
    raise ValueError(reduction)
