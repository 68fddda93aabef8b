"""Fused Transformer-XL relative-position MHSA — Pallas TPU kernel.

The XLA attention path materializes, per layer and direction, the
[B, H, T, 2T-1] position-score tensor, its rel-shifted [B, H, T, T] view,
the masked scores, the softmax statistics and the probability matrix, plus
the [B,T,H,D]<->[B,H,T,D] layout transposes around every dot — at flagship
shapes the op profile attributes ~20% of step time to the resulting "data
formatting" + softmax VMEM traffic (docs/ROADMAP.md round-3b). This kernel
computes one BATCH ROW of attention entirely in VMEM, with heads kept
FLATTENED IN LANES ([B, T, H*D] — the natural Dense output layout, so no
transpose ever materializes anywhere):

  * per head h (static 64-aligned lane slice):
      content scores  ac = (q + bias_u)_h · k_h^T            (MXU)
      position scores bd = rel_shift((q + bias_v)_h · p_h^T) — the
        row-dependent rel-shift is ONE hardware strided rotate
        (tpu.dynamic_rotate via pltpu.roll; backward conjugates the
        inverse shift by MXU row-flips since the rotate only supports
        amounts increasing with row), bit-exact vs the XL pad/reshape
        trick; interpret/CPU falls back to an equivalent log2(W)-step
        barrel shifter (static lane rolls masked per sublane row);
      masked f32 softmax (padding lens + optional (left, right) band),
        fully-masked query rows -> 0 like the XLA path;
      optional inverted dropout on the probabilities from the TPU
        hardware PRNG, seeded per (batch, head) so backward regenerates
        the identical mask (interpret mode / CPU passes a precomputed
        mask operand instead — the pltpu PRNG has no CPU lowering);
      out_h = probs · v_h                                     (MXU).

The backward kernel recomputes the forward row (flash-style remat: only
q/k/v/p are residuals) and emits d_qu, d_qv, dk, dv in one pass plus the
position-table gradient dp accumulated across the batch grid dimension by
output-block revisiting.

T is padded to a multiple of 128 and the whole [Tp, Tp] row is held in
VMEM per head (~4 MB/tile at T=256, E=512) — the right regime for ASR
encoder lengths (T ~ 200 after 4x subsampling). Longer sequences keep the
XLA path; the module falls back automatically above MAX_T.

Reference semantics: NeMo multi_head_attention.py:157-251
(RelPositionMultiHeadAttention) — scores (ac+bd)/sqrt(D), -1e9 masking,
post-softmax re-zeroing, dropout on probabilities.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_T = 512  # above this the [Tp, Tp] rows no longer fit VMEM comfortably

# Escape hatch (and regression canary — cf. the Tc=64 libtpu story in
# docs/ROADMAP.md): FLASH_HW_ROLL=0 reverts the rel-shift to the barrel
# shifter on real hardware. scripts/validate_flash_mhsa_tpu.py A/Bs the
# two paths bit-for-bit each run.
_HW_ROLL = os.environ.get("FLASH_HW_ROLL", "1") == "1"

_NEG = -1e30


def _pad_to(x, n, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad) if n != x.shape[axis] else x


def _roll_left(x, s):
    """Circular left-roll along lanes via static slices + concat (Mosaic's
    tpu.dynamic_rotate only supports 32-bit data; this form is
    dtype-agnostic, so the barrel can run in the compute dtype)."""
    return jnp.concatenate([x[:, s:], x[:, :s]], axis=1)


def _skew_hw(raw, Tp):
    """[Tp, 2Tp] f32 -> [Tp, Tp]: the _skew data movement as ONE hardware
    strided rotate (tpu.dynamic_rotate rolls row t right by
    shift + stride*t lanes, mod the width; right-roll by Tp+1+t on width
    2Tp == the left-roll by Tp-1-t that _skew's barrel performs in
    (Tp-1).bit_length() masked roll+select passes). 32-bit dtypes only —
    callers roll the f32 dot output and apply the compute-dtype cast
    AFTER (data movement commutes with the cast bit-exactly)."""
    return pltpu.roll(raw, Tp + 1, 1, stride=1, stride_axis=0)[:, :Tp]


def _skew(raw, Tp):
    """[Tp, 2Tp] -> [Tp, Tp]: out[t, j] = raw[t, (Tp-1) + j - t].

    Row t is left-rolled by (Tp-1-t) with a barrel shifter: log2(2Tp)
    static lane rolls, each applied only to rows whose roll amount has
    that bit set. No wraparound contamination: j + (Tp-1-t) <= 2Tp-2.
    Interpret-mode/CPU fallback for _skew_hw (bit-identical results).
    """
    r = (Tp - 1) - jax.lax.broadcasted_iota(jnp.int32, (Tp, 1), 0)
    z = raw
    # roll amounts are <= Tp-1, so only (Tp-1).bit_length() bits are live
    # (the W/2 shift would never be selected — skip the dead pass)
    for kbit in range((Tp - 1).bit_length()):
        m = ((r >> kbit) & 1) == 1
        z = jnp.where(m, _roll_left(z, 1 << kbit), z)
    return z[:, :Tp]


def _unskew(ds, Tp):
    """Adjoint of _skew: [Tp, Tp] -> [Tp, 2Tp], d_raw[t, (Tp-1)+j-t] = ds[t, j].

    Right-roll of the zero-padded cotangent by the same per-row amounts;
    wrapped entries land in (and read from) the zero padding, so the
    scatter-add is exact.
    """
    W = 2 * Tp
    r = (Tp - 1) - jax.lax.broadcasted_iota(jnp.int32, (Tp, 1), 0)
    x = jnp.pad(ds, ((0, 0), (0, W - Tp)))
    for kbit in range((Tp - 1).bit_length()):
        m = ((r >> kbit) & 1) == 1
        x = jnp.where(m, _roll_left(x, W - (1 << kbit)), x)
    return x


def _score_mask(Tp, n_valid, left, right):
    """[Tp, Tp] bool: key j visible from query t."""
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    mask = (t_idx < n_valid) & (j_idx < n_valid)
    rel = j_idx - t_idx
    if left >= 0:
        mask &= rel >= -left
    if right >= 0:
        mask &= rel <= right
    return mask


def _flip_rows_mat(Tp, dtype=jnp.float32):
    """Anti-diagonal permutation J (J @ x flips x's rows). Mosaic has no
    `rev` lowering; a 0/1 matmul flips EXACTLY (each output row receives
    a single 1.0*x product) and rides the MXU."""
    r_i = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    return (r_i + c_i == Tp - 1).astype(dtype)


def _head_probs(qu_h, qv_h, k_h, p_h, mask, *, scale, dropout_rate,
                seed, b_id, h_id, mask_mode, keep_ref, hw_roll=False):
    """One head's [Tp, Tp] probability row -> (P f32 pre-dropout, keep).

    mask_mode: "none" (no dropout), "prng" (TPU hardware PRNG seeded per
    (b, h) — identical draw in fwd and bwd), or "input" (precomputed mask
    operand — the interpret-mode/CPU path)."""
    Tp = qu_h.shape[0]
    ac = jax.lax.dot_general(
        qu_h, k_h, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Tp, Tp]
    raw = jax.lax.dot_general(
        qv_h, p_h, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Tp, 2Tp]
    if hw_roll:
        # one hardware strided rotate on the f32 dot output, then the
        # same compute-dtype round-trip the barrel path applies before
        # its shift — bit-identical scores, ~40% less kernel VPU time
        bd = _skew_hw(raw, Tp).astype(qu_h.dtype).astype(jnp.float32)
    else:
        # the barrel shifter is the kernel's VPU-bound hot loop: run it
        # in the compute dtype (bf16 at flagship halves its VMEM
        # traffic) — the same scores-in-compute-dtype AMP contract as
        # the XLA path; exact at f32
        bd = _skew(raw.astype(qu_h.dtype), Tp).astype(jnp.float32)
    s = (ac + bd) * scale
    s = jnp.where(mask, s, _NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.where(mask, jnp.exp(s - m), 0.0)
    denom = jnp.sum(e, axis=1, keepdims=True)
    p = e * pl.reciprocal(jnp.where(denom == 0.0, 1.0, denom), approx=False)
    keep = None
    if mask_mode == "prng":
        # combined seed: identical for the same (b, h) in fwd and bwd
        pltpu.prng_seed(seed + b_id * 65536 + h_id)
        bits = pltpu.prng_random_bits((Tp, Tp))
        keep = bits <= jnp.uint32(int((1.0 - dropout_rate) * (2**32 - 1)))
    elif mask_mode == "input":
        keep = keep_ref[0, h_id]
    return p, keep


def _apply_drop(p, keep, rate):
    if keep is None:
        return p
    return jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)


def _fwd_kernel(lens_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, seed_ref,
                *rest, n_heads, scale, left, right, dropout_rate,
                mask_mode, hw_roll):
    if mask_mode == "input":
        keep_ref, o_ref = rest
    else:
        keep_ref, (o_ref,) = None, rest
    b = pl.program_id(0)
    Tp = qu_ref.shape[1]
    D = qu_ref.shape[2] // n_heads
    mask = _score_mask(Tp, lens_ref[b], left, right)
    for h in range(n_heads):
        sl = slice(h * D, (h + 1) * D)
        p, keep = _head_probs(
            qu_ref[0, :, sl], qv_ref[0, :, sl], k_ref[0, :, sl],
            p_ref[:, sl], mask,
            scale=scale, dropout_rate=dropout_rate,
            seed=seed_ref[0], b_id=b, h_id=h, mask_mode=mask_mode,
            keep_ref=keep_ref, hw_roll=hw_roll,
        )
        pd = _apply_drop(p, keep, dropout_rate).astype(v_ref.dtype)
        o_ref[0, :, sl] = jax.lax.dot_general(
            pd, v_ref[0, :, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _bwd_kernel(lens_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, seed_ref,
                *rest, n_heads, scale, left, right, dropout_rate,
                mask_mode, hw_roll):
    if mask_mode == "input":
        keep_ref, do_ref, dqu_ref, dqv_ref, dk_ref, dv_ref, dp_ref = rest
    else:
        keep_ref = None
        do_ref, dqu_ref, dqv_ref, dk_ref, dv_ref, dp_ref = rest
    b = pl.program_id(0)
    Tp = qu_ref.shape[1]
    D = qu_ref.shape[2] // n_heads
    mask = _score_mask(Tp, lens_ref[b], left, right)
    if hw_roll:
        J = _flip_rows_mat(Tp)  # shared across the head loop
    for h in range(n_heads):
        sl = slice(h * D, (h + 1) * D)
        qu = qu_ref[0, :, sl]
        qv = qv_ref[0, :, sl]
        k = k_ref[0, :, sl]
        p_h = p_ref[:, sl]
        P, keep = _head_probs(
            qu, qv, k, p_h, mask,
            scale=scale, dropout_rate=dropout_rate,
            seed=seed_ref[0], b_id=b, h_id=h, mask_mode=mask_mode,
            keep_ref=keep_ref, hw_roll=hw_roll,
        )
        dO = do_ref[0, :, sl].astype(jnp.float32)
        v = v_ref[0, :, sl]

        Pd = _apply_drop(P, keep, dropout_rate)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            Pd, dO, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)

        dPd = jax.lax.dot_general(
            dO, v.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Tp, Tp]
        dP = _apply_drop(dPd, keep, dropout_rate)
        delta = jnp.sum(dP * P, axis=1, keepdims=True)
        dS = P * (dP - delta) * scale  # f32 [Tp, Tp]

        dSc = dS.astype(qu.dtype)
        dqu_ref[0, :, sl] = jax.lax.dot_general(
            dSc, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dqu_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            dSc, qu, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)

        if hw_roll:
            # d_raw = unskew(dS): right-roll row t by Tp-1-t. The
            # hardware rotate's per-row amount must INCREASE with t, so
            # conjugate by a row flip — amounts become t' = Tp-1-t.
            # Mosaic has no `rev`: flip via the J matmul (exact 0/1
            # products), and fold the post-flip into the two SMALL
            # per-head operands instead of the [Tp, 2Tp] slab:
            #   d_raw = J @ z,  z = roll(pad(J @ dS))
            #   d_raw · p_h = J @ (z · p_h)          (flip [Tp, D])
            #   d_rawT · qv = zT · (J @ qv)          (flip [Tp, D])
            # Same compute-dtype cast contract as the barrel path: cast
            # dS BEFORE the movement. For f32 compute the flips must run
            # at HIGHEST precision — at default precision the MXU
            # silently truncates f32 operands to bf16, re-rounding the
            # cotangent (measured 6.4e-3 on dq). For bf16 compute the
            # default is already exact (the MXU consumes bf16 natively)
            # and Mosaic REJECTS an fp32 contract on bf16 operands
            # ("Bad lhs type"), so gate on the dtype.
            flip_prec = (
                jax.lax.Precision.HIGHEST
                if qv.dtype == jnp.float32 else
                jax.lax.Precision.DEFAULT
            )
            Jc = J.astype(qv.dtype)
            dS_f = jax.lax.dot_general(
                Jc, dS.astype(qv.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=flip_prec)
            z = pltpu.roll(
                jnp.pad(dS_f, ((0, 0), (0, Tp))), 0, 1,
                stride=1, stride_axis=0).astype(qv.dtype)
            zp = jax.lax.dot_general(
                z, p_h, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqv_ref[0, :, sl] = jax.lax.dot_general(
                Jc, zp.astype(qv.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=flip_prec,
            ).astype(dqv_ref.dtype)
            qv_f = jax.lax.dot_general(
                Jc, qv, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=flip_prec).astype(qv.dtype)
            dp_tile = jax.lax.dot_general(
                z, qv_f, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [2Tp, D]
        else:
            # cast BEFORE the barrel-shifter unskew (same AMP contract
            # as _joint_dot's backward: cotangents in the compute dtype)
            d_raw = _unskew(dS.astype(qv.dtype), Tp)  # [Tp, 2Tp]
            dqv_ref[0, :, sl] = jax.lax.dot_general(
                d_raw, p_h, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dqv_ref.dtype)

            dp_tile = jax.lax.dot_general(
                d_raw, qv, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [2Tp, D]

        # dp is revisited across the (sequential) batch grid dimension
        @pl.when(b == 0)
        def _init():
            dp_ref[:, sl] = dp_tile

        @pl.when(b != 0)
        def _acc():
            dp_ref[:, sl] += dp_tile


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14)
)
def _flash(qu, qv, k, v, p_pad, lens, seed, keep, n_heads, scale, left,
           right, dropout_rate, mask_mode, interpret):
    return _flash_fwd(
        qu, qv, k, v, p_pad, lens, seed, keep, n_heads, scale, left,
        right, dropout_rate, mask_mode, interpret,
    )[0]


def _row_spec(Tp, E):
    return pl.BlockSpec((1, Tp, E), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _flash_fwd(qu, qv, k, v, p_pad, lens, seed, keep, n_heads, scale,
               left, right, dropout_rate, mask_mode, interpret):
    B, Tp, E = qu.shape
    row = _row_spec(Tp, E)
    pos = pl.BlockSpec((2 * Tp, E), lambda b: (0, 0),
                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem, row, row, row, row, pos, smem]
    operands = [lens, qu, qv, k, v, p_pad, seed]
    if mask_mode == "input":
        in_specs.append(
            pl.BlockSpec((1, n_heads, Tp, Tp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(keep)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, n_heads=n_heads, scale=scale, left=left,
            right=right, dropout_rate=dropout_rate, mask_mode=mask_mode,
            hw_roll=not interpret and _HW_ROLL,  # no interpret rule
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((B, Tp, E), qu.dtype),
        interpret=interpret,
    )(*operands)
    return out, (qu, qv, k, v, p_pad, lens, seed, keep)


def _flash_bwd(n_heads, scale, left, right, dropout_rate, mask_mode,
               interpret, res, dout):
    qu, qv, k, v, p_pad, lens, seed, keep = res
    B, Tp, E = qu.shape
    row = _row_spec(Tp, E)
    pos = pl.BlockSpec((2 * Tp, E), lambda b: (0, 0),
                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem, row, row, row, row, pos, smem]
    operands = [lens, qu, qv, k, v, p_pad, seed]
    if mask_mode == "input":
        in_specs.append(
            pl.BlockSpec((1, n_heads, Tp, Tp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(keep)
    in_specs.append(row)
    operands.append(dout)
    dqu, dqv, dk, dv, dp = pl.pallas_call(
        functools.partial(
            _bwd_kernel, n_heads=n_heads, scale=scale, left=left,
            right=right, dropout_rate=dropout_rate, mask_mode=mask_mode,
            hw_roll=not interpret and _HW_ROLL,  # no interpret rule
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=[row, row, row, row, pos],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, E), qu.dtype),
            jax.ShapeDtypeStruct((B, Tp, E), qu.dtype),
            jax.ShapeDtypeStruct((B, Tp, E), k.dtype),
            jax.ShapeDtypeStruct((B, Tp, E), v.dtype),
            jax.ShapeDtypeStruct((2 * Tp, E), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return dqu, dqv, dk, dv, dp.astype(p_pad.dtype), None, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_relpos_mhsa(
    q: jnp.ndarray,        # [B, T, E] compute dtype, E = n_heads * D
    k: jnp.ndarray,        # [B, T, E]
    v: jnp.ndarray,        # [B, T, E]
    p: jnp.ndarray,        # [2T-1, E] position projections (XL order:
                           #   row m encodes relative position (T-1) - m)
    bias_u: jnp.ndarray,   # [n_heads, D]
    bias_v: jnp.ndarray,   # [n_heads, D]
    lens: jnp.ndarray,     # [B] valid lengths
    *,
    n_heads: int,
    left: int = -1,
    right: int = -1,
    dropout_rate: float = 0.0,
    dropout_seed: jnp.ndarray | None = None,  # [] or [1] int32
    interpret: bool | None = None,  # None: real kernel on TPU, else interpret
) -> jnp.ndarray:
    """Fused rel-pos attention; returns [B, T, E] in q's dtype.

    Equals the XLA path (scores (ac+bd)/sqrt(D), masked softmax, zeroed
    fully-masked rows, inverted dropout on probabilities) up to f32
    associativity; dropout draws a different (still deterministic) stream.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, E = q.shape
    if dropout_rate > 0.0:
        mask_mode = "input" if interpret else "prng"
    else:
        mask_mode = "none"
    if T > MAX_T:
        raise ValueError(
            f"flash_relpos_mhsa holds [Tp, Tp] rows in VMEM; T={T} > "
            f"{MAX_T}. Use the XLA attention path for long sequences."
        )
    Tp = max(128, -(-T // 128) * 128)
    u_flat = bias_u.reshape(-1).astype(q.dtype)
    v_flat = bias_v.reshape(-1).astype(q.dtype)
    qu = _pad_to(q + u_flat, Tp, 1)
    qv = _pad_to(q + v_flat, Tp, 1)
    k = _pad_to(k, Tp, 1)
    v = _pad_to(v, Tp, 1)
    # p_pad[m'] = p[m' - (Tp - T)]: front pad Tp-T, back pad to 2Tp. Padded
    # rows are never selected by the skew for valid (t, j).
    p_pad = jnp.pad(p, ((Tp - T, Tp - T + 1), (0, 0)))
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(dropout_seed, jnp.int32).reshape((1,))
    if mask_mode == "input":
        keep = jax.random.bernoulli(
            jax.random.PRNGKey(seed[0].astype(jnp.uint32)),
            1.0 - dropout_rate, (B, n_heads, Tp, Tp),
        )
    else:
        keep = jnp.zeros((1, 1, 1, 1), jnp.bool_)  # unused placeholder
    out = _flash(
        qu, qv, k, v, p_pad, lens.astype(jnp.int32), seed, keep,
        int(n_heads), 1.0 / math.sqrt(E // n_heads), int(left),
        int(right), float(dropout_rate), mask_mode, bool(interpret),
    )
    return out[:, :T]


def relpos_attention_reference(q, k, v, p, bias_u, bias_v, lens, *,
                               left=-1, right=-1):
    """Pure-XLA oracle mirroring models/conformer.py RelPosSelfAttention
    (no dropout), for kernel parity tests. Takes [B, T, H, D] inputs."""
    B, T, H, D = q.shape
    ac = jnp.einsum("bthd,bshd->bhts", q + bias_u, k,
                    preferred_element_type=jnp.float32)
    raw = jnp.einsum("bthd,phd->bhtp", q + bias_v, p,
                     preferred_element_type=jnp.float32)
    b, h, t, pw = raw.shape
    x = jnp.pad(raw, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, pw + 1, t)[:, :, 1:, :].reshape(b, h, t, pw)
    bd = x[:, :, :, :T]
    s = (ac + bd) / math.sqrt(D)
    valid = jnp.arange(T)[None, :] < lens[:, None]
    mask = valid[:, :, None] & valid[:, None, :]
    rel = jnp.arange(T)[None, :] - jnp.arange(T)[:, None]
    if left >= 0:
        mask &= (rel >= -left)[None]
    if right >= 0:
        mask &= (rel <= right)[None]
    mask = mask[:, None]
    s = jnp.where(mask, s, -1e9)
    attn = jax.nn.softmax(s, axis=-1)
    attn = jnp.where(mask, attn, 0.0)
    return jnp.einsum("bhts,bshd->bthd", attn, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
