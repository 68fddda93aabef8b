"""Learning without Forgetting: per-batch teacher/student distillation.

Reference semantics (cl_baseline_lwf.py:207-265, SURVEY.md §3.5): for every
batch of task t>0,
  * the previous task's weights act as a frozen teacher; the reference
    swaps them in VIA A DISK ROUND-TRIP each batch (:220-234, flagged
    "extremely slow" in its own README). Here the teacher is simply a
    second in-memory parameter pytree — pure win, no semantic change;
  * KD terms (:242-259):
      ctc_kd  = KL(teacher_ctc || student_ctc)   'batchmean' over B
      rnnt_kd = KL(teacher_joint || student_joint) 'batchmean', averaged
                over the fused sub-batches
  * total (:264):
      loss = (1 - kd) * task + kd * ((1 - kd_ctx) * rnnt_kd + kd_ctx * ctc_kd)

Documented fix (SURVEY.md §3.5 nuance): the reference's fused joint stores
RAW logits on GPU yet feeds them to KL as if they were log-probs
(rnnt.py:1649-1662). We apply log_softmax to both teacher and student joint
logits before the KL — the mathematically intended objective. Set
``faithful_raw_logits=True`` to reproduce the reference's raw-logit
behavior bit-for-bit.

The joint KD is computed chunked over T with remat (never materializing
either full B x T x U x V tensor) and the teacher's chunk shares the
student's loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.rnnt_loss_fused import _activate


@dataclasses.dataclass
class LwFConfig:
    knowledge_distillation: float = 0.1       # kd weight
    knowledge_distillation_ctx: float = 1.0   # kd_ctx: ctc share
    faithful_raw_logits: bool = False
    # Storage dtype for the frozen teacher pytree. LwF holds teacher +
    # student + AdamW moments at once (~4x params, SURVEY.md §7 hard-part
    # 5); "bfloat16" halves the teacher's HBM. The teacher forward already
    # COMPUTES in bf16 (flagship compute dtype), so storing bf16 only
    # moves the cast from apply-time to snapshot-time; "float32" keeps the
    # reference's exact teacher numerics.
    teacher_dtype: str = "float32"


@dataclasses.dataclass
class LwFState:
    teacher_params: Any = None  # frozen previous-task params (+batch stats)
    teacher_batch_stats: Any = None


def end_task(
    params: Any, batch_stats: Any, teacher_dtype: str = "float32"
) -> LwFState:
    """Snapshot the just-trained weights as the next task's teacher —
    replaces save_model/load_state_dict disk IPC (cl_baseline_lwf.py:
    220-234). The `jnp.array` copy (optionally downcast to bf16, see
    LwFConfig.teacher_dtype) also decouples the teacher's buffers from
    the donated student TrainState."""
    dt = jnp.dtype(teacher_dtype)

    def snap(x):
        x = jnp.asarray(x)
        # only downcast float leaves; ints (step counters etc.) stay
        if dt != jnp.float32 and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.array(x, dtype=dt)
        return jnp.array(x)

    return LwFState(
        teacher_params=jax.tree.map(snap, params),
        teacher_batch_stats=jax.tree.map(snap, batch_stats),
    )


def ctc_kd_loss(student_logprobs, teacher_logprobs, row_mask=None):
    """KL(teacher || student), torch kl_div(input=student_logprob,
    target=teacher_prob, reduction='batchmean') semantics: sum / B
    (cl_baseline_lwf.py:242-246). ``row_mask`` drops the repeated pad
    rows of a final bucket batch (our artifact; the reference's B is all
    real rows)."""
    t = jax.lax.stop_gradient(teacher_logprobs.astype(jnp.float32))
    s = student_logprobs.astype(jnp.float32)
    kl = jnp.exp(t) * (t - s)
    if row_mask is not None:
        kl = jnp.where(
            row_mask.reshape((-1,) + (1,) * (kl.ndim - 1)), kl, 0.0
        )
        return jnp.sum(kl) / row_mask.sum()
    return jnp.sum(kl) / student_logprobs.shape[0]


def joint_kd_chunked(
    f_proj_s, g_proj_s, f_proj_t, g_proj_t, head_w_s, head_b_s,
    head_w_t, head_b_t, *,
    activation: str = "relu", chunk_size: int = 64,
    faithful_raw_logits: bool = False, row_mask=None,
    uniform_head: bool = False,
):
    """Chunked KL(teacher joint || student joint), 'batchmean' over B
    (cl_baseline_lwf.py:248-259).

    Masked OUT (our artifacts): frames added by chunk-padding (the KD is
    chunk-size-invariant) and repeated pad rows (``row_mask``). The
    in-bucket T/U padding stays included, like the reference's KL over
    its pad-to-max tensors."""
    B, T, H = f_proj_s.shape
    n_chunks = -(-T // chunk_size)
    T_pad = n_chunks * chunk_size
    pad = T_pad - T
    if pad:
        f_proj_s = jnp.pad(f_proj_s, ((0, 0), (0, pad), (0, 0)))
        f_proj_t = jnp.pad(f_proj_t, ((0, 0), (0, pad), (0, 0)))
    fs = f_proj_s.reshape(B, n_chunks, chunk_size, H).swapaxes(0, 1)
    ft = f_proj_t.reshape(B, n_chunks, chunk_size, H).swapaxes(0, 1)

    def joint_chunk(f_chunk, g_proj, w, b):
        inp = _activate(
            f_chunk[:, :, None, :] + g_proj[:, None, :, :], activation
        )
        # cast the f32 head gather to the compute dtype so the KD joint
        # matmul runs bf16-input/f32-accumulate on the MXU instead of a
        # silently promoted all-f32 dot (same fix as rnnt_loss_fused)
        if uniform_head:
            # single-language batch: one shared head -> a single large
            # matmul instead of a B-batched one (see
            # rnnt_loss_fused._joint_dot_shared; CL task batches are
            # uniform by construction, host-checked in train/driver.py)
            return (
                jnp.einsum(
                    "btuh,hv->btuv", inp, w[0].astype(inp.dtype),
                    preferred_element_type=jnp.float32,
                )
                + b[0]
            )
        return (
            jnp.einsum(
                "btuh,bhv->btuv", inp, w.astype(inp.dtype),
                preferred_element_type=jnp.float32,
            )
            + b[:, None, None, :]
        )

    @jax.checkpoint
    def chunk_kd(args):
        ci, f_s, f_t = args
        s = joint_chunk(f_s, g_proj_s, head_w_s, head_b_s)
        t = jax.lax.stop_gradient(
            joint_chunk(f_t, g_proj_t, head_w_t, head_b_t)
        )
        if not faithful_raw_logits:
            s = jax.nn.log_softmax(s, axis=-1)
            t = jax.nn.log_softmax(t, axis=-1)
        # torch kl_div(input=s, target=exp(t)): sum exp(t) * (t - s)
        kl = jnp.sum(jnp.exp(t) * (t - s), axis=(2, 3))  # [B, Tc]
        t_abs = ci * chunk_size + jnp.arange(chunk_size)
        kl = jnp.where((t_abs < T)[None, :], kl, 0.0)
        if row_mask is not None:
            kl = jnp.where(row_mask[:, None], kl, 0.0)
        return jnp.sum(kl)

    total = jax.lax.map(chunk_kd, (jnp.arange(n_chunks), fs, ft)).sum()
    n_rows = row_mask.sum() if row_mask is not None else B
    return total / n_rows
