"""Fused RNNT joint-head Pallas kernels.

The joint is the memory hog of transducer training: even chunked, the XLA
path writes each chunk's [B, Tc, U+1, V+1] logits to HBM, log-softmaxes
them, gathers two columns — and the backward recompute does it again. These
kernels keep the logits tile entirely in VMEM:

  forward:  per (batch row, T-chunk): inp = act(f_tile + g) -> MXU matmul
            with that sample's language head -> log-sum-exp -> write ONLY
            the blank/label log-prob slabs [Tc, U+1].
  backward: recomputes the tile, forms dlogits from the slab cotangents via
            the softmax identity, and produces d_f, d_g, d_w, d_b with two
            more MXU matmuls — d_g/d_w/d_b accumulate across the chunk grid
            dimension in VMEM.

Optional inverted dropout on the joint hidden uses the TPU PRNG, seeded per
(batch, chunk) so forward and backward draw identical masks.

This is the op the reference implements as fused_batch_size sub-batching +
numba loss (reference: NeMo modules/rnnt.py:1403-1561, SURVEY.md §5.7) —
here it is a single custom-VJP primitive composed with the lattice
(ops/rnnt_loss.py). Equivalence to the XLA chunk path is tested in
tests/test_joint_fused_pallas.py (interpret mode) and selected via
rnnt_loss_fused(..., impl="pallas").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dropout_mask(shape, rate: float):
    """Inverted-dropout keep mask from the already-seeded TPU PRNG."""
    bits = pltpu.prng_random_bits(shape)  # uint32
    threshold = jnp.uint32(int((1.0 - rate) * (2**32 - 1)))
    return bits <= threshold


def _fwd_kernel(
    f_ref, g_ref, w_ref, b_ref, labels_ref, seed_ref,
    lpb_ref, lpl_ref,
    *, blank: int, dropout_rate: float,
):
    # f [1,Tc,H]; g [1,U1,H]; w [1,H,V1]; b [1,1,V1]; labels [1,1,U1]
    # (b/labels carry a singleton middle dim so their VMEM blocks satisfy
    # Mosaic's last-two-dims tiling rule)
    _, Tc, H = f_ref.shape
    U1 = g_ref.shape[1]
    V1 = w_ref.shape[2]

    inp = jax.nn.relu(
        f_ref[0][:, None, :] + g_ref[0][None, :, :]
    )  # [Tc, U1, H]
    if dropout_rate > 0.0:
        pltpu.prng_seed(
            seed_ref[0] + pl.program_id(0) * 65536 + pl.program_id(1)
        )
        keep = _dropout_mask((Tc, U1, H), dropout_rate)
        inp = jnp.where(keep, inp / (1.0 - dropout_rate), 0.0)

    logits = (
        jax.lax.dot_general(
            inp.reshape(Tc * U1, H), w_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[0, 0][None, :]
    ).reshape(Tc, U1, V1)

    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = m[..., 0] + jnp.log(
        jnp.sum(jnp.exp(logits - m), axis=-1)
    )  # [Tc, U1]
    lpb_ref[0] = logits[:, :, blank] - lse
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (1, U1, V1), 2)
    lab_onehot = (
        v_iota == labels_ref[0, 0][None, :, None]
    ).astype(jnp.float32)
    lpl_ref[0] = jnp.sum(logits * lab_onehot, axis=-1) - lse


def _bwd_kernel(
    f_ref, g_ref, w_ref, b_ref, labels_ref, seed_ref, dlpb_ref, dlpl_ref,
    df_ref, dg_ref, dw_ref, db_ref,
    *, blank: int, dropout_rate: float,
):
    _, Tc, H = f_ref.shape
    U1 = g_ref.shape[1]
    V1 = w_ref.shape[2]
    c = pl.program_id(1)

    pre = f_ref[0][:, None, :] + g_ref[0][None, :, :]  # [Tc, U1, H]
    inp = jax.nn.relu(pre)
    if dropout_rate > 0.0:
        pltpu.prng_seed(
            seed_ref[0] + pl.program_id(0) * 65536 + pl.program_id(1)
        )
        keep = _dropout_mask((Tc, U1, H), dropout_rate)
        inp = jnp.where(keep, inp / (1.0 - dropout_rate), 0.0)

    inp2 = inp.reshape(Tc * U1, H)
    logits = (
        jax.lax.dot_general(
            inp2, w_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[0, 0][None, :]
    ).reshape(Tc, U1, V1)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    softmax = e / jnp.sum(e, axis=-1, keepdims=True)

    dlpb = dlpb_ref[0].astype(jnp.float32)  # [Tc, U1]
    dlpl = dlpl_ref[0].astype(jnp.float32)
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (1, U1, V1), 2)
    lab_onehot = (
        v_iota == labels_ref[0, 0][None, :, None]
    ).astype(jnp.float32)
    dlogits = (
        dlpb[:, :, None] * (v_iota == blank).astype(jnp.float32)
        + dlpl[:, :, None] * lab_onehot
        - softmax * (dlpb + dlpl)[:, :, None]
    ).reshape(Tc * U1, V1)

    # d_inp = dlogits @ w^T, masked by relu' (and dropout)
    d_inp = jax.lax.dot_general(
        dlogits, w_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Tc*U1, H]
    relu_mask = (pre > 0).reshape(Tc * U1, H)
    d_inp = jnp.where(relu_mask, d_inp, 0.0)
    if dropout_rate > 0.0:
        d_inp = jnp.where(
            keep.reshape(Tc * U1, H), d_inp / (1.0 - dropout_rate), 0.0
        )
    d_inp3 = d_inp.reshape(Tc, U1, H)

    df_ref[0] = jnp.sum(d_inp3, axis=1).astype(df_ref.dtype)

    @pl.when(c == 0)
    def _():
        dg_ref[0] = jnp.zeros_like(dg_ref[0])
        dw_ref[0] = jnp.zeros_like(dw_ref[0])
        db_ref[0, 0] = jnp.zeros_like(db_ref[0, 0])

    dg_ref[0] += jnp.sum(d_inp3, axis=0).astype(dg_ref.dtype)
    dw_ref[0] += jax.lax.dot_general(
        inp2, dlogits,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw_ref.dtype)
    db_ref[0, 0] += jnp.sum(dlogits, axis=0).astype(db_ref.dtype)


def _pad_time(x, Tc):
    B, T, H = x.shape
    n_chunks = -(-T // Tc)
    pad = n_chunks * Tc - T
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x, n_chunks


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9)
)
def joint_slabs_pallas(
    f_proj, g_proj, head_w, head_b, labels_pad, seed,
    blank: int, chunk_size: int = 64, dropout_rate: float = 0.0,
    interpret: bool = False,
):
    """(lp_blank, lp_label) both [B, T, U+1] — fused joint + log-softmax +
    gather. f_proj [B,T,H]; g_proj [B,U1,H]; head_w [B,H,V1]; head_b
    [B,V1]; labels_pad [B,U1] (column U ignored by the lattice); seed
    [1] int32 (traced — per-step dropout without recompiles)."""
    out, _ = _fwd(f_proj, g_proj, head_w, head_b, labels_pad, seed, blank,
                  chunk_size, dropout_rate, interpret)
    return out


def _call_fwd(f_proj, g_proj, head_w, head_b, labels_pad, seed, blank,
              chunk_size, dropout_rate, interpret):
    B, T, H = f_proj.shape
    U1 = g_proj.shape[1]
    V1 = head_w.shape[2]
    f_pad, nc = _pad_time(f_proj, chunk_size)
    T_pad = nc * chunk_size
    seed_arr = seed.astype(jnp.int32).reshape(1)

    grid = (B, nc)
    kernel = functools.partial(
        _fwd_kernel, blank=blank, dropout_rate=dropout_rate
    )
    lpb, lpl = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk_size, H), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1, H), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, V1), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V1), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, U1), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk_size, U1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk_size, U1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T_pad, U1), jnp.float32),
            jax.ShapeDtypeStruct((B, T_pad, U1), jnp.float32),
        ],
        interpret=interpret,
    )(
        f_pad, g_proj, head_w, head_b[:, None, :],
        labels_pad.astype(jnp.int32)[:, None, :], seed_arr,
    )
    return lpb[:, :T], lpl[:, :T]


def _fwd(f_proj, g_proj, head_w, head_b, labels_pad, seed, blank,
         chunk_size, dropout_rate, interpret):
    out = _call_fwd(f_proj, g_proj, head_w, head_b, labels_pad, seed, blank,
                    chunk_size, dropout_rate, interpret)
    return out, (f_proj, g_proj, head_w, head_b, labels_pad, seed)


def _bwd(blank, chunk_size, dropout_rate, interpret, res, cots):
    f_proj, g_proj, head_w, head_b, labels_pad, seed = res
    dlpb, dlpl = cots
    B, T, H = f_proj.shape
    U1 = g_proj.shape[1]
    V1 = head_w.shape[2]
    f_pad, nc = _pad_time(f_proj, chunk_size)
    dlpb_pad, _ = _pad_time(dlpb, chunk_size)
    dlpl_pad, _ = _pad_time(dlpl, chunk_size)
    seed_arr = seed.astype(jnp.int32).reshape(1)

    kernel = functools.partial(
        _bwd_kernel, blank=blank, dropout_rate=dropout_rate
    )
    df, dg, dw, db = pl.pallas_call(
        kernel,
        grid=(B, nc),
        in_specs=[
            pl.BlockSpec((1, chunk_size, H), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1, H), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, V1), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V1), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, U1), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk_size, U1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk_size, U1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk_size, H), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1, H), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, V1), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V1), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nc * chunk_size, H), f_proj.dtype),
            jax.ShapeDtypeStruct((B, U1, H), g_proj.dtype),
            jax.ShapeDtypeStruct((B, H, V1), head_w.dtype),
            jax.ShapeDtypeStruct((B, 1, V1), head_b.dtype),
        ],
        interpret=interpret,
    )(
        f_pad, g_proj, head_w, head_b[:, None, :],
        labels_pad.astype(jnp.int32)[:, None, :],
        seed_arr, dlpb_pad, dlpl_pad,
    )
    return df[:, :T], dg, dw, db[:, 0, :], None, None


joint_slabs_pallas.defvjp(_fwd, _bwd)
