"""Single-launch Pallas TPU kernel for batched RNNT beam search.

The XLA batched beam (ops/beam_search.py rnnt_beam_search_batched) is
sequential-latency-bound the same way the greedy decoder was: every
expansion round re-dispatches a dozen small kernels (joint dot, top-k,
beam gathers, LSTM-cell fusion) from a while-loop body, ~80 ms/batch at
flagship eval shapes vs 19.4 ms for the fused greedy kernel
(docs/PERF.md). This kernel runs the ENTIRE beam search — frame scan,
expansion loop, top-K selection, prefix merging, prediction-net LSTM
steps — inside ONE kernel launch with every decode weight VMEM-resident,
streaming f_proj from HBM on the same sequential T-grid as
ops/decode_fused_pallas.py.

Semantics are EXACTLY rnnt_beam_search_batched (frame-synchronous beam,
`max_expansions` rounds per frame, blank-finalization, in-beam Graves
prefix merging, blank-padded outputs); parity is tested per-element
against the XLA beam (tests/test_beam_fused.py). Reference spec: NeMo's
beam/maes strategy dispatch (rnnt_decoding.py) — the reference runs
beams as HOST loops; here the whole search is one device program.

Mosaic has no native gather/scatter between hypothesis rows, so every
cross-row move rides a ONE-HOT MXU matmul over the flat [B*K, ...]
hypothesis state:

  * parent gather after top-K: ``S @ X`` with ``S[r, c] = (c ==
    (r//K)*K + parent[r])`` — exact for f32/bf16/int payloads (one-hot
    rows, f32 accumulation);
  * flat [B*K, 1] <-> per-batch [B, K] layout changes: K tiny
    ``G_k`` / ``G_k^T`` selection matmuls instead of the [B*K, C] ->
    [B, K*C] reshapes Mosaic cannot legalize on tiled registers;
  * per-hypothesis top-P over the vocab and per-batch top-K over the
    K*(P+1) candidate matrix: iterative masked argmax (first-index
    tie-breaking, identical to lax.top_k).

Single-language batches only (weights gathered for ONE language before
the call, the same contract as the fused greedy kernel); mixed batches
keep the XLA path. The joint activation is hardcoded RELU — callers
gate on model_cfg.joint_activation (train/eval.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_fused_pallas import T_CHUNK

MAX_T = 4096
MAX_BK = 256        # flat hypothesis rows (B * beam_size)
NEG = -1.0e30

# The beam kernel's Mosaic stack exceeds the 16 MiB default scoped-vmem
# limit (measured on v5e 2026-08-20: 30.61 MiB requested at BK=64
# flagship shapes — B=16, K=4, H=640, V1=257), so the launch raises the
# per-kernel cap. Budget below 128 MiB/core leaves room for the
# double-buffered f_proj input window, resident weights and outputs.
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def beam_vmem_bytes(B: int, K: int, T: int, H: int, V1: int,
                    max_out: int = 256, itemsize: int = 2) -> int:
    """Combined VMEM estimate for one fused-beam launch: the
    double-buffered [T_CHUNK, B, H] input window plus the Mosaic scoped
    stack. The stack model is anchored to the measured v5e allocation
    (30.61 MiB at BK=64, H=640, V1=257, max_out=256): a ~8.5 MiB
    BK-independent part (weight value copies) plus a per-hypothesis-row
    part scaled from the flagship measurement. Mirrors
    decode_fused_pallas.decode_vmem_bytes for the greedy path."""
    BK = B * K
    f_block = 2 * min(T, T_CHUNK) * B * H * itemsize
    weights_part = int(8.5 * 2**20)
    # measured flagship row cost: (30.61 MiB - weights_part) / 64 rows,
    # linearly rescaled for H / V1 / max_out relative to the anchor
    anchor_row = (30.61 * 2**20 - weights_part) / 64.0
    shape_scale = (H / 640 + (V1 / 257) + (max_out / 256)) / 3.0
    stack = weights_part + int(BK * anchor_row * shape_scale)
    return f_block + stack


def fits_fused_beam(B: int, K: int, T: int, H: int, V1: int,
                    max_out: int = 256, itemsize: int = 2) -> bool:
    """True iff a (B, K, T) launch passes the per-dim caps AND the
    combined VMEM budget (VERDICT r4: the beam gate previously checked
    only T/BK caps despite a strictly larger scratch than greedy)."""
    return (
        T <= MAX_T
        and B * K <= MAX_BK
        and beam_vmem_bytes(B, K, T, H, V1, max_out, itemsize)
        <= VMEM_LIMIT_BYTES
    )


def _kernel(f_ref, lens_ref, table_ref, wih_ref, whh_ref, b_ref,
            wp_ref, bp_ref, head_ref, hb_ref,
            out_ref, olen_ref, oscore_ref,
            tok_sc, len_sc, score_sc, g_sc, h_sc, c_sc,
            *, blank, K, P, max_expansions, max_out):
    T, B, H = f_ref.shape
    BK = B * K
    V = table_ref.shape[0]
    V1 = head_ref.shape[1]
    cdt = table_ref.dtype
    C = K + K * P                   # candidate columns: K stays + K*P exts

    # --- constant selection matrices (iota compares, built per launch) ---
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (BK, 1), 0)      # flat row
    b_of_r = r_iota // K
    k_of_r = r_iota - b_of_r * K
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (BK, V), 1)
    iota_v1 = jax.lax.broadcasted_iota(jnp.int32, (BK, V1), 1)
    iota_o = jax.lax.broadcasted_iota(jnp.int32, (BK, max_out), 1)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (BK, P), 1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    # S0 [BK, B]: f_rep = S0 @ f_t  (row r <- f_t[r // K])
    s0 = (
        jax.lax.broadcasted_iota(jnp.int32, (BK, B), 1) == b_of_r
    ).astype(jnp.float32)
    # G_k [B, BK] selects hypothesis slot k of every batch row; its
    # transpose scatters a [B, 1] column back into flat rows b*K + k.
    bk_cols = jax.lax.broadcasted_iota(jnp.int32, (B, BK), 1)
    b_rows = jax.lax.broadcasted_iota(jnp.int32, (B, BK), 0)
    g_mats = [
        (bk_cols == b_rows * K + k).astype(jnp.float32) for k in range(K)
    ]
    gt_mats = [
        (jax.lax.broadcasted_iota(jnp.int32, (BK, B), 1) == b_of_r)
        .astype(jnp.float32)
        * (k_of_r == k).astype(jnp.float32)
        for k in range(K)
    ]

    def fdot(a, b):
        # One-hot SELECTION matmuls carrying f32 payloads (scores, LSTM
        # cell state). precision=HIGHEST is load-bearing: the MXU's
        # default f32 matmul is a single bf16 pass, which QUANTIZES the
        # payload to bf16 on every gather (measured on v5e 2026-08-20:
        # beam scores collapsed to multiples of 4 at |score|~1000,
        # crushing token-vs-blank log-prob gaps into ties — hardware
        # divergence that interpret mode, exact f32, cannot show). The
        # bf16x3 HIGHEST path reconstructs one-hot-selected f32 values
        # exactly (1.0 x (hi+mid+lo) == x).
        return jax.lax.dot_general(
            a.astype(jnp.float32), b.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def dot(a, b):  # compute-dtype MXU dot, f32 accumulation
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)

    def gather_rows(sel, x, out_int=False):
        """x [BK, C] -> x[src_row] per flat row via one-hot matmul."""
        y = fdot(sel, x)
        return y.astype(jnp.int32) if out_int else y

    def per_slot(x):
        """[BK, C] -> list of K [B, C] slot views (G_k matmuls)."""
        return [fdot(g, x) for g in g_mats]

    def to_flat(cols):
        """list of K [B, 1] columns -> [BK, 1] flat layout."""
        acc = fdot(gt_mats[0], cols[0])
        for k in range(1, K):
            acc = acc + fdot(gt_mats[k], cols[k])
        return acc

    w_ih = wih_ref[:]
    w_hh = whh_ref[:]
    b_g = b_ref[:]
    w_p = wp_ref[:]
    b_p = bp_ref[:]
    head = head_ref[:]
    head_b = hb_ref[:]

    def sig(x):
        e = jnp.exp(-jnp.abs(x))
        nonneg = x.astype(jnp.float32) >= 0
        return jnp.where(nonneg, 1.0 / (1.0 + e), e / (1.0 + e))

    def pred_step(label, h, c):
        """LSTM + pred-side joint projection; mirrors
        decode_fused_pallas._kernel.pred_step exactly."""
        oh = (iota_v == label).astype(cdt)
        emb = dot(oh, table_ref[:])
        gates = dot(emb, w_ih) + b_g + dot(h, w_hh)
        i_g = sig(gates[:, 0 * H:1 * H])
        f_g = sig(gates[:, 1 * H:2 * H])
        g_g = jnp.tanh(gates[:, 2 * H:3 * H])
        o_g = sig(gates[:, 3 * H:4 * H])
        c_new = f_g * c.astype(cdt) + i_g * g_g
        h_new = o_g * jnp.tanh(c_new)
        g_proj = dot(h_new, w_p) + b_p
        return g_proj, h_new, c_new.astype(jnp.float32)

    def logp_rows(f_rep, g):
        """[BK, V1] log-softmax joint logits (relu activation, f32).

        The shifted form mirrors jax.nn.log_softmax's exact op order —
        (logits - m) - log(sum(exp(logits - m))) — NOT the algebraically
        equal logits - (m + log(sum)): the two round differently in f32,
        and the XLA beam's scores are accumulated from the former."""
        logits = jax.lax.dot_general(
            jnp.maximum(f_rep + g, 0), head,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + head_b
        shifted = logits - jnp.max(logits, axis=-1, keepdims=True)
        return shifted - jnp.log(
            jnp.sum(jnp.exp(shifted), axis=-1, keepdims=True)
        )

    def blank_col(lp):
        return jnp.sum(
            jnp.where(iota_v1 == blank, lp, 0.0), axis=-1, keepdims=True
        )

    i = pl.program_id(0)
    blank_lbl = jnp.full((BK, 1), blank, jnp.int32)

    @pl.when(i == 0)
    def _init():
        g0, h0, c0 = pred_step(
            blank_lbl, jnp.zeros((BK, H), cdt),
            jnp.zeros((BK, H), jnp.float32),
        )
        g_sc[:] = g0
        h_sc[:] = h0
        c_sc[:] = c0
        tok_sc[:] = jnp.full((BK, max_out), blank, jnp.int32)
        len_sc[:] = jnp.zeros((BK, 1), jnp.int32)
        # only slot 0 is live at t=0 (matches the XLA beam's scores0)
        score_sc[:] = jnp.where(k_of_r == 0, 0.0, NEG).astype(jnp.float32)

    lens_flat = fdot(s0, lens_ref[:].astype(jnp.float32)).astype(jnp.int32)
    t_base = i * T

    def frame(t, carry):
        tokens, lens, scores, g, h, c = carry
        f_t = f_ref[pl.ds(t, 1), :, :].reshape(B, H)
        f_rep = fdot(s0, f_t).astype(cdt)                 # [BK, H]
        frame_active = (t_base + t) < lens_flat           # [BK, 1]

        def cond(inner):
            e, _, _, _, _, _, _, done_i = inner
            return (e < max_expansions) & (jnp.sum(1 - done_i) > 0)

        def body(inner):
            e, tokens, lens, scores, g, h, c, done_i = inner
            done = done_i > 0
            lp = logp_rows(f_rep, g)                      # [BK, V1] f32
            lp_b = blank_col(lp)                          # [BK, 1]
            can_extend = (~done) & (lens < max_out)
            stay = jnp.where(done, scores, scores + lp_b)
            # per-hypothesis top-P non-blank (iterative masked argmax,
            # first-index tie-breaking == lax.top_k)
            rem = jnp.where(iota_v1 == blank, NEG, lp)
            ext_cols, id_cols = [], []
            for _p in range(P):
                m = jnp.max(rem, axis=-1, keepdims=True)
                idx = jnp.min(
                    jnp.where(rem == m, iota_v1, V1), axis=-1,
                    keepdims=True,
                )
                ext_cols.append(
                    jnp.where(can_extend, scores + m, NEG)
                )
                id_cols.append(idx)
                rem = jnp.where(iota_v1 == idx, NEG, rem)
            ext_ids = jnp.concatenate(id_cols, axis=1)    # [BK, P] i32
            ext_sc = jnp.concatenate(ext_cols, axis=1)    # [BK, P] f32

            # candidate matrix [B, C] in the XLA beam's flat order —
            # per parent k: [stay_k, ext_k_0 .. ext_k_{P-1}] — so
            # argmax tie-breaking picks the IDENTICAL candidate
            # (beam_search.py reshapes [K, P+1] the same way)
            stay_k = per_slot(stay)                       # K x [B, 1]
            ext_k = per_slot(ext_sc)                      # K x [B, P]
            cand = jnp.concatenate(
                [col for k in range(K) for col in (stay_k[k], ext_k[k])],
                axis=1,
            )

            # per-batch top-K over candidates
            sel_cols, sc_cols = [], []
            rem_c = cand
            for _k in range(K):
                m = jnp.max(rem_c, axis=-1, keepdims=True)
                sel = jnp.min(
                    jnp.where(rem_c == m, iota_c, C), axis=-1,
                    keepdims=True,
                )
                sc_cols.append(m)
                sel_cols.append(sel)
                rem_c = jnp.where(iota_c == sel, NEG, rem_c)

            new_scores = to_flat(sc_cols)                 # [BK, 1] f32
            sel_flat = to_flat(
                [s.astype(jnp.float32) for s in sel_cols]
            ).astype(jnp.int32)
            parent = sel_flat // (P + 1)
            slot = sel_flat - parent * (P + 1)
            is_stay = slot == 0
            p_sel = jnp.maximum(slot - 1, 0)

            # one-hot parent gather over the flat hypothesis state
            src = b_of_r * K + parent
            sel_m = (
                jax.lax.broadcasted_iota(jnp.int32, (BK, BK), 1) == src
            ).astype(jnp.float32)
            p_tokens = gather_rows(sel_m, tokens.astype(jnp.float32),
                                   out_int=True)
            p_lens = gather_rows(sel_m, lens.astype(jnp.float32),
                                 out_int=True)
            p_done = gather_rows(sel_m, done_i.astype(jnp.float32),
                                 out_int=True)
            p_g = gather_rows(sel_m, g).astype(cdt)
            p_h = gather_rows(sel_m, h).astype(cdt)
            p_c = gather_rows(sel_m, c)
            p_ext_ids = gather_rows(sel_m, ext_ids.astype(jnp.float32),
                                    out_int=True)

            tok = jnp.sum(
                jnp.where(iota_p == p_sel, p_ext_ids, 0), axis=-1,
                keepdims=True,
            )                                             # [BK, 1]
            emit = ~is_stay
            new_tokens = jnp.where(
                (iota_o == jnp.clip(p_lens, 0, max_out - 1)) & emit,
                tok, p_tokens,
            )
            new_lens = p_lens + emit.astype(jnp.int32)
            new_done = (p_done > 0) | is_stay

            def step_pred(_):
                label = jnp.where(emit, tok, blank_lbl)
                g2, h2, c2 = pred_step(label, p_h, p_c)
                return (
                    jnp.where(emit, g2, p_g),
                    jnp.where(emit, h2, p_h),
                    jnp.where(emit, c2, p_c),
                )

            any_emit = jnp.sum(emit.astype(jnp.int32)) > 0
            g3, h3, c3 = jax.lax.cond(
                any_emit, step_pred, lambda _: (p_g, p_h, p_c), None
            )
            return (e + 1, new_tokens, new_lens, new_scores, g3, h3, c3,
                    new_done.astype(jnp.int32))

        done0 = (scores <= NEG / 2).astype(jnp.int32)     # dead slots
        init = (jnp.int32(0), tokens, lens, scores, g, h, c, done0)
        (_, tokens2, lens2, scores2, g2, h2, c2, done2) = (
            jax.lax.while_loop(cond, body, init)
        )

        # force-finalize hypotheses that ran out of expansions
        lp = logp_rows(f_rep, g2)
        scores2 = jnp.where(
            (done2 > 0) | (scores2 <= NEG / 2),
            scores2, scores2 + blank_col(lp),
        )

        # Graves prefix merge restricted to the beam: operate on the K
        # per-batch score columns, then rebuild the flat layout exactly
        sk = per_slot(scores2)                            # K x [B, 1]
        tk = per_slot(tokens2.astype(jnp.float32))        # K x [B, max_out]
        lk = per_slot(lens2.astype(jnp.float32))
        for a in range(K):
            for b2 in range(a + 1, K):
                same = (
                    (lk[a] == lk[b2])
                    & jnp.all(tk[a] == tk[b2], axis=-1, keepdims=True)
                    & (sk[a] > NEG / 2)
                    & (sk[b2] > NEG / 2)
                )
                merged = jnp.logaddexp(sk[a], sk[b2])
                sk[a] = jnp.where(same, merged, sk[a])
                sk[b2] = jnp.where(same, NEG, sk[b2])
        scores2 = to_flat(sk)

        # rows whose frames are exhausted carry through unchanged
        m = frame_active
        tokens = jnp.where(m, tokens2, tokens)
        lens = jnp.where(m, lens2, lens)
        scores = jnp.where(m, scores2, scores)
        g = jnp.where(m, g2, g)
        h = jnp.where(m, h2, h)
        c = jnp.where(m, c2, c)
        return tokens, lens, scores, g, h, c

    tokens, lens, scores, g, h, c = jax.lax.fori_loop(
        0, T, frame,
        (tok_sc[:], len_sc[:], score_sc[:], g_sc[:], h_sc[:], c_sc[:]),
    )
    tok_sc[:] = tokens
    len_sc[:] = lens
    score_sc[:] = scores
    g_sc[:] = g
    h_sc[:] = h
    c_sc[:] = c

    # best-of-beam per batch row (argmax over the K score columns)
    sk = per_slot(scores)
    tk = per_slot(tokens.astype(jnp.float32))
    lk = per_slot(lens.astype(jnp.float32))
    best_s = sk[0]
    best_t = tk[0]
    best_l = lk[0]
    for k in range(1, K):
        better = sk[k] > best_s
        best_s = jnp.where(better, sk[k], best_s)
        best_t = jnp.where(better, tk[k], best_t)
        best_l = jnp.where(better, lk[k], best_l)
    out_ref[:] = best_t.astype(jnp.int32)
    olen_ref[:] = best_l.astype(jnp.int32)
    oscore_ref[:] = best_s


@functools.partial(
    jax.jit,
    static_argnames=(
        "blank", "beam_size", "max_expansions", "max_out", "topk",
        "interpret",
    ),
)
def rnnt_beam_search_fused(
    f_proj: jnp.ndarray,      # [B, T, H] encoder-side joint projections
    frame_lens: jnp.ndarray,  # [B]
    weights: dict,            # decode_fused_pallas.extract_decode_weights
    *,
    blank: int,
    beam_size: int = 4,
    max_expansions: int = 6,
    max_out: int = 256,
    topk: int | None = None,
    interpret: bool = False,
):
    """Fused single-kernel batched beam search.

    Returns (ids [B, max_out] blank-padded, lens [B], scores [B]) —
    output contract identical to ops/beam_search.rnnt_beam_search_batched.
    RELU joint activation only (see module docstring)."""
    B, T, H = f_proj.shape
    K = beam_size
    P = topk if topk is not None else beam_size
    if T > MAX_T or B * K > MAX_BK:
        raise ValueError(
            f"fused beam supports T<={MAX_T}, B*K<={MAX_BK}; got "
            f"B={B} K={K} T={T} (fall back to the XLA beam)"
        )
    cdt = weights["table"].dtype
    kern = functools.partial(
        _kernel, blank=blank, K=K, P=P,
        max_expansions=max_expansions, max_out=max_out,
    )
    tc = min(T, T_CHUNK)
    n_chunks = -(-T // tc)
    inv = lambda i: (0, 0)  # noqa: E731 — grid-invariant block
    BK = B * K
    out, olen, oscore = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=(
            pl.BlockSpec((tc, B, H), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, 1), inv),
            pl.BlockSpec(weights["table"].shape, inv),
            pl.BlockSpec(weights["w_ih"].shape, inv),
            pl.BlockSpec(weights["w_hh"].shape, inv),
            pl.BlockSpec(weights["bias"].shape, inv),
            pl.BlockSpec(weights["wp"].shape, inv),
            pl.BlockSpec(weights["bp"].shape, inv),
            pl.BlockSpec(weights["head"].shape, inv),
            pl.BlockSpec(weights["head_b"].shape, inv),
        ),
        out_specs=(
            pl.BlockSpec((B, max_out), inv),
            pl.BlockSpec((B, 1), inv),
            pl.BlockSpec((B, 1), inv),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, max_out), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BK, max_out), jnp.int32),   # token history
            pltpu.VMEM((BK, 1), jnp.int32),         # lengths
            pltpu.VMEM((BK, 1), jnp.float32),       # scores
            pltpu.VMEM((BK, H), cdt),               # g
            pltpu.VMEM((BK, H), cdt),               # h
            pltpu.VMEM((BK, H), jnp.float32),       # c
        ],
        # the beam body's Mosaic stack measures 30.61 MiB at flagship
        # BK=64 — above the 16 MiB default scoped-vmem limit; raise the
        # cap for this kernel (callers gate on fits_fused_beam)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(
        jnp.swapaxes(f_proj.astype(cdt), 0, 1),  # [T, B, H]
        frame_lens.astype(jnp.int32).reshape(B, 1),
        weights["table"],
        weights["w_ih"],
        weights["w_hh"],
        weights["bias"],
        weights["wp"],
        weights["bp"],
        weights["head"],
        weights["head_b"],
    )
    return out, olen.reshape(B), oscore.reshape(B)
