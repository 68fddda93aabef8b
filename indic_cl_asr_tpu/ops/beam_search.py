"""Beam-search decoding: CTC prefix beam search and RNNT (Graves) beam.

Completes the reference's decoding strategy surface beyond greedy
(reference: parts/submodules/rnnt_decoding.py strategy dispatch
greedy/greedy_batch/beam..., rnnt_beam_decoding and ctc beam classes). The
reference's beam searches are host-side per-sample python loops over GPU
calls; ours are the same shape — host control flow around jitted
pred/joint step callables — because beam search is control-flow bound, not
FLOP bound. The hot batched path remains ops/decoding.py's greedy.

CTC: standard prefix beam search (Hannun et al. 2014) over blank/non-blank
prefix probabilities. RNNT: Graves 2012 beam search with prefix merging and
an expansion cap per frame.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Callable

import numpy as np

NEG_INF = -float("inf")


def _logaddexp(a: float, b: float) -> float:
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def ctc_prefix_beam_search(
    log_probs: np.ndarray,  # [T, V+1], blank LAST, log-softmaxed
    frame_len: int,
    blank: int | None = None,
    beam_size: int = 8,
    prune_logp: float = -12.0,
) -> list[int]:
    """Best label prefix under CTC prefix beam search."""
    T, V1 = log_probs.shape
    if blank is None:
        blank = V1 - 1
    # prefix -> (log p ending in blank, log p ending in non-blank)
    beams: dict[tuple, tuple[float, float]] = {(): (0.0, NEG_INF)}
    for t in range(min(frame_len, T)):
        row = log_probs[t]
        keep = np.where(row > prune_logp)[0]
        if len(keep) == 0:
            keep = [int(np.argmax(row))]
        next_beams: dict[tuple, list[float]] = defaultdict(
            lambda: [NEG_INF, NEG_INF]
        )
        for prefix, (p_b, p_nb) in beams.items():
            p_tot = _logaddexp(p_b, p_nb)
            for v in keep:
                p = float(row[v])
                if v == blank:
                    nb = next_beams[prefix]
                    nb[0] = _logaddexp(nb[0], p_tot + p)
                    continue
                last = prefix[-1] if prefix else None
                if v == last:
                    # repeat char: extends non-blank same-prefix, or makes a
                    # new prefix only via a preceding blank
                    nb = next_beams[prefix]
                    nb[1] = _logaddexp(nb[1], p_nb + p)
                    ext = next_beams[prefix + (v,)]
                    ext[1] = _logaddexp(ext[1], p_b + p)
                else:
                    ext = next_beams[prefix + (v,)]
                    ext[1] = _logaddexp(ext[1], p_tot + p)
        ranked = sorted(
            next_beams.items(),
            key=lambda kv: -_logaddexp(kv[1][0], kv[1][1]),
        )[:beam_size]
        beams = {k: (v[0], v[1]) for k, v in ranked}
    best = max(beams.items(), key=lambda kv: _logaddexp(*kv[1]))
    return list(best[0])


class _Hyp:
    __slots__ = ("score", "ys", "state", "g")

    def __init__(self, score, ys, state, g):
        self.score = score
        self.ys = ys
        self.state = state
        self.g = g


def rnnt_beam_search(
    f_proj: np.ndarray,        # [T, H] projected encoder frames (1 sample)
    frame_len: int,
    lang_id: int,
    pred_step: Callable,       # ([B] labels, state) -> (g [B, H], state)
    joint_step: Callable,      # (f_t [B,H], g [B,H], lang [B]) -> [B, V+1]
    *,
    blank: int,
    beam_size: int = 4,
    max_expansions: int = 10,
) -> list[int]:
    """Graves 2012 transducer beam search for one utterance."""
    import jax.numpy as jnp

    def pred1(label, state):
        g, st = pred_step(jnp.asarray([label], jnp.int32), state)
        return np.asarray(g[0]), st

    def logits1(t, g):
        out = joint_step(
            jnp.asarray(f_proj[None, t]), jnp.asarray(g[None]),
            jnp.asarray([lang_id], jnp.int32),
        )
        x = np.asarray(out[0], np.float32)
        x = x - x.max()
        return x - math.log(np.exp(x).sum())

    g0, st0 = pred1(blank, None)
    B = [_Hyp(0.0, (), st0, g0)]

    for t in range(min(frame_len, len(f_proj))):
        A = sorted(B, key=lambda h: -h.score)
        B = []
        merged: dict[tuple, float] = {}
        expansions = 0
        while A and expansions < max_expansions:
            best = A.pop(0)
            lp = logits1(t, best.g)
            # blank: hypothesis moves to the next frame
            b_score = best.score + float(lp[blank])
            if best.ys in merged:
                # prefix merge: logsumexp scores of identical sequences
                for h in B:
                    if h.ys == best.ys:
                        h.score = _logaddexp(h.score, b_score)
                        break
            else:
                merged[best.ys] = b_score
                B.append(_Hyp(b_score, best.ys, best.state, best.g))
            # non-blank expansions stay in this frame
            order = np.argsort(-lp)
            for v in order[: beam_size + 1]:
                v = int(v)
                if v == blank:
                    continue
                g_new, st_new = pred1(v, best.state)
                A.append(
                    _Hyp(best.score + float(lp[v]), best.ys + (v,),
                         st_new, g_new)
                )
            A = sorted(A, key=lambda h: -h.score)[:beam_size]
            expansions += 1
            # stop when the best unexpanded hyp can't beat the worst kept
            if len(B) >= beam_size:
                B = sorted(B, key=lambda h: -h.score)[:beam_size]
                if not A or A[0].score < B[-1].score:
                    break
        if not B:
            B = A[:beam_size]
        B = sorted(B, key=lambda h: -h.score)[:beam_size]

    return list(max(B, key=lambda h: h.score).ys)
