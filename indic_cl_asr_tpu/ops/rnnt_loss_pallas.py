"""Pallas TPU kernels for the RNNT lattice wavefront.

The lax.scan lattice (ops/rnnt_loss.py) is correct everywhere but pays
per-iteration dispatch overhead: ~505 tiny scan steps cost ~4.4 ms on a
v5e (measured, B16 T204 U49). These kernels run the same anti-diagonal
recurrences as ONE Mosaic program with the whole [B, D, U+1] slab resident
in VMEM (≈0.8 MB per tensor at flagship shapes), eliminating that overhead.

Functional spec is identical to the scan path (same free-blank padding,
same exit-row injection) — the equivalence test in tests/test_rnnt_pallas.py
checks both values and the custom-VJP gradients. The GPU reference for this
op is the numba wavefront kernel family
(reference: parts/numba/rnnt_loss/utils/cuda_utils/gpu_rnnt_kernel.py:74/176),
which parallelizes one CUDA block per batch row; on TPU the whole batch
rides the VPU lanes of a single program instead.

Used automatically on TPU backends (ops/rnnt_loss.py dispatch);
`interpret=True` keeps the kernels testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _shift_right_2d(x):
    """[B, U1] -> shifted along axis 1; position 0 gets NEG_INF."""
    B, U1 = x.shape
    rolled = pltpu.roll(x, 1, 1)
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (B, U1), 1)
    return jnp.where(u_iota == 0, NEG_INF, rolled)


def _shift_left_2d(x):
    B, U1 = x.shape
    rolled = pltpu.roll(x, U1 - 1, 1)  # roll shift must be non-negative
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (B, U1), 1)
    return jnp.where(u_iota == U1 - 1, NEG_INF, rolled)


def _alpha_kernel(lpb_d_ref, lpl_d_ref, alpha_ref):
    """Forward wavefront over diagonals. All refs [B, D, U1] in VMEM."""
    B, D, U1 = lpb_d_ref.shape
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (B, U1), 1)
    alpha0 = jnp.where(u_iota == 0, 0.0, NEG_INF)
    alpha_ref[:, 0, :] = alpha0

    def body(d, alpha_prev):
        lpb_prev = lpb_d_ref[:, d - 1, :]
        lpl_prev = lpl_d_ref[:, d - 1, :]
        blank = alpha_prev + lpb_prev
        label = _shift_right_2d(alpha_prev + lpl_prev)
        alpha_d = jnp.logaddexp(blank, label)
        alpha_ref[:, d, :] = alpha_d
        return alpha_d

    jax.lax.fori_loop(1, D, body, alpha0)


def _beta_kernel(lpb_d_ref, lpl_d_ref, u_lens_ref, t_rows_ref, beta_ref):
    """Backward wavefront over the EXTENDED lattice (virtual exit row
    t = T). lpb_d/lpl_d/beta: [B, D', U1]; u_lens: [B, 1] int32 in VMEM;
    t_rows: [1, 1] int32 in SMEM holding T."""
    B, D, U1 = lpb_d_ref.shape
    T = t_rows_ref[0, 0]
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (B, U1), 1)
    exit_row = jnp.where(u_iota == u_lens_ref[:, 0][:, None], 0.0, NEG_INF)

    beta_last = jnp.where((D - 1 - u_iota) == T, exit_row, NEG_INF)
    beta_ref[:, D - 1, :] = beta_last

    def body(i, beta_next):
        d = D - 2 - i
        blank = lpb_d_ref[:, d, :] + beta_next
        label = lpl_d_ref[:, d, :] + _shift_left_2d(beta_next)
        cand = jnp.logaddexp(blank, label)
        beta_d = jnp.where((d - u_iota) == T, exit_row, cand)
        beta_ref[:, d, :] = beta_d
        return beta_d

    jax.lax.fori_loop(0, D - 1, body, beta_last)


@functools.partial(jax.jit, static_argnames=("interpret",))
def alpha_diagonals_pallas(lpb_d, lpl_d, interpret: bool = False):
    """[B, D, U1] diagonal-layout slabs -> alpha diagonals [B, D, U1]."""
    return pl.pallas_call(
        _alpha_kernel,
        out_shape=jax.ShapeDtypeStruct(lpb_d.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lpb_d.astype(jnp.float32), lpl_d.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def beta_diagonals_pallas(lpb_de, lpl_de, u_lens, T: int,
                          interpret: bool = False):
    """Extended-lattice diagonal slabs [B, D', U1] -> beta diagonals."""
    B = lpb_de.shape[0]
    t_rows = jnp.full((1, 1), T, jnp.int32)
    return pl.pallas_call(
        _beta_kernel,
        out_shape=jax.ShapeDtypeStruct(lpb_de.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        lpb_de.astype(jnp.float32),
        lpl_de.astype(jnp.float32),
        u_lens.astype(jnp.int32).reshape(B, 1),
        t_rows,
    )
