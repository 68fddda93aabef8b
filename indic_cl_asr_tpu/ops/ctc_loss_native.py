"""Native CTC forward-backward lattice with a custom VJP.

Same role as torch.nn.CTCLoss in the reference (losses/ctc.py:25-82) and a
drop-in alternative to the optax lattice in ops/ctc_loss.py. Design mirrors
ops/rnnt_loss.py: the recurrence over the extended label sequence
(blank-interleaved, S = 2U+1) is a `lax.scan` over T whose body is three
shifted adds + a masked logsumexp over [B, S] — no within-row dependency at
all (unlike the transducer, CTC's row recurrence only reads the previous
row), so each step is one fused VPU op. The backward pass recomputes beta
and applies the occupancy formula.

Profiling motivation: optax.ctc_loss fwd+bwd measured 3.6 ms at flagship
shapes (B16 T204 V257) — a third of the whole train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _extend_labels(labels: jnp.ndarray, blank: int):
    """[B, U] -> ext [B, 2U+1] = [blank, y1, blank, y2, ..., blank]."""
    B, U = labels.shape
    ext = jnp.full((B, 2 * U + 1), blank, labels.dtype)
    ext = ext.at[:, 1::2].set(labels)
    return ext


def _transition_masks(ext: jnp.ndarray, u_lens: jnp.ndarray, blank: int):
    """skip-allowed mask (s-2 transition) and valid-state mask."""
    B, S = ext.shape
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    is_label = (s_iota % 2) == 1
    prev2 = jnp.concatenate(
        [jnp.full((B, 2), blank - 1, ext.dtype), ext[:, :-2]], axis=1
    )  # ext[s-2]; fill with a value never equal to a label
    skip_ok = is_label & (ext != prev2)
    valid_s = s_iota < (2 * u_lens + 1)[:, None]
    return skip_ok, valid_s


def _shift1(x):
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (1,), NEG_INF, x.dtype), x[..., :-1]], -1
    )


def _shift2(x):
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (2,), NEG_INF, x.dtype), x[..., :-2]], -1
    )


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(
        jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m)
    )


def _alpha_scan(lp_ext, skip_ok, valid_s):
    """lp_ext [B, T, S] (log-prob of ext[s] at t) -> alpha [B, T, S]."""
    B, T, S = lp_ext.shape
    init = jnp.full((B, S), NEG_INF)
    init = init.at[:, 0].set(0.0)
    if S > 1:
        init = init.at[:, 1].set(0.0)

    skip_add = jnp.where(skip_ok, 0.0, NEG_INF)
    valid_add = jnp.where(valid_s, 0.0, NEG_INF)

    def step(alpha_prev, lp_row):
        stay = alpha_prev
        diag = _shift1(alpha_prev)
        skip = _shift2(alpha_prev) + skip_add
        alpha = _lse3(stay, diag, skip) + lp_row + valid_add
        return alpha, alpha

    # the t=0 row is just init + lp[0]
    first = init + lp_ext[:, 0] + valid_add
    # unroll=4: tiny [B, S] row bodies — loop overhead dominates
    _, rest = jax.lax.scan(
        step, first, jnp.swapaxes(lp_ext[:, 1:], 0, 1), unroll=4
    )
    return jnp.concatenate(
        [first[:, None], jnp.swapaxes(rest, 0, 1)], axis=1
    )


def _beta_scan(lp_ext, skip_ok, valid_s, t_lens, u_lens):
    """beta[t, s] = log P(suffix | at s, time t), terminal injected at
    t = t_len - 1. Returns beta [B, T, S] (excludes lp at t)."""
    B, T, S = lp_ext.shape
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    terminal = jnp.where(
        (s_iota == 2 * u_lens[:, None])
        | (s_iota == 2 * u_lens[:, None] - 1),
        0.0,
        NEG_INF,
    )
    # forward skip (s -> s+2) is allowed when the DESTINATION's skip_ok
    skip_ok_fwd = jnp.concatenate(
        [skip_ok[:, 2:], jnp.zeros((B, 2), bool)], axis=1
    )
    valid_add = jnp.where(valid_s, 0.0, NEG_INF)

    def shift_left1(x):
        return jnp.concatenate(
            [x[..., 1:], jnp.full(x.shape[:-1] + (1,), NEG_INF, x.dtype)], -1
        )

    def shift_left2(x):
        return jnp.concatenate(
            [x[..., 2:], jnp.full(x.shape[:-1] + (2,), NEG_INF, x.dtype)], -1
        )

    def step(beta_next, xs):
        lp_next, t = xs  # lp at time t+1; computing beta at time t
        b_lp = beta_next + lp_next + valid_add  # absorb emission at t+1
        stay = b_lp
        diag = shift_left1(b_lp)
        skip = shift_left2(b_lp) + jnp.where(skip_ok_fwd, 0.0, NEG_INF)
        beta_t = _lse3(stay, diag, skip)
        beta_t = jnp.where((t == t_lens - 1)[:, None], terminal, beta_t)
        return beta_t, beta_t

    ts = jnp.arange(T - 2, -1, -1)
    beta_last = jnp.where((T - 1 == t_lens[:, None] - 1), terminal, NEG_INF)
    lp_rev = jnp.swapaxes(lp_ext, 0, 1)[ts + 1]  # lp at t+1, descending t
    _, rest = jax.lax.scan(step, beta_last, (lp_rev, ts), unroll=4)
    beta = jnp.concatenate(
        [jnp.flip(jnp.swapaxes(rest, 0, 1), 1), beta_last[:, None]], axis=1
    )
    return beta


@jax.custom_vjp
def ctc_nll_native(log_probs, labels, t_lens, u_lens, blank):
    nll, _, _, _ = _forward(log_probs, labels, t_lens, u_lens, blank)
    return nll


def _forward(log_probs, labels, t_lens, u_lens, blank):
    B, T, V = log_probs.shape
    ext = _extend_labels(labels.astype(jnp.int32), blank)
    skip_ok, valid_s = _transition_masks(ext, u_lens.astype(jnp.int32), blank)
    lp_ext = jnp.take_along_axis(
        log_probs.astype(jnp.float32), ext[:, None, :], axis=2
    )  # [B, T, S]
    alpha = _alpha_scan(lp_ext, skip_ok, valid_s)
    # logZ at t = t_len-1 over final states {2u, 2u-1}
    alpha_final = jnp.take_along_axis(
        alpha, (t_lens.astype(jnp.int32) - 1)[:, None, None], axis=1
    )[:, 0]  # [B, S]
    s_iota = jax.lax.broadcasted_iota(jnp.int32, alpha_final.shape, 1)
    u2 = 2 * u_lens.astype(jnp.int32)[:, None]
    end_mask = (s_iota == u2) | (s_iota == u2 - 1)
    ends = jnp.where(end_mask, alpha_final, NEG_INF)
    m = jnp.max(ends, axis=1)
    logZ = m + jnp.log(jnp.sum(jnp.exp(ends - m[:, None]), axis=1))
    return -logZ, alpha, (ext, skip_ok, valid_s, lp_ext), logZ


def _fwd(log_probs, labels, t_lens, u_lens, blank):
    nll, alpha, aux, logZ = _forward(log_probs, labels, t_lens, u_lens, blank)
    return nll, (log_probs, labels, t_lens, u_lens, blank, alpha, logZ)


def _bwd(res, g):
    log_probs, labels, t_lens, u_lens, blank, alpha, logZ = res
    B, T, V = log_probs.shape
    ext = _extend_labels(labels.astype(jnp.int32), blank)
    skip_ok, valid_s = _transition_masks(ext, u_lens.astype(jnp.int32), blank)
    lp_ext = jnp.take_along_axis(
        log_probs.astype(jnp.float32), ext[:, None, :], axis=2
    )
    beta = _beta_scan(
        lp_ext, skip_ok, valid_s, t_lens.astype(jnp.int32),
        u_lens.astype(jnp.int32),
    )
    occ = jnp.exp(alpha + beta - logZ[:, None, None])  # [B, T, S]
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (B, T, 1), 1)
    occ = jnp.where(t_iota < t_lens[:, None, None], occ, 0.0)
    occ = jnp.where(valid_s[:, None, :], occ, 0.0)
    onehot = jax.nn.one_hot(ext, V, dtype=occ.dtype)  # [B, S, V]
    # full-precision scatter (default TPU matmul precision would round the
    # occupancies through bf16)
    dlp = -jnp.einsum(
        "bts,bsv->btv", occ, onehot,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return (dlp * g[:, None, None]).astype(log_probs.dtype), None, None, None, None


ctc_nll_native.defvjp(_fwd, _bwd)
