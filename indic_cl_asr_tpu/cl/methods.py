"""CL method adapters plugging ewc/mas/lwf into the sequence driver.

Each adapter owns its algorithm state across tasks and provides:
  * penalty_fn(task_idx) for the jitted train step,
  * the optional "+1 importance epoch" batch/finalize hooks
    (EWC: Fisher; MAS: output-energy importance — SURVEY.md §3.4),
  * for LwF, a replacement train step with the distillation loss
    (SURVEY.md §3.5).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..models.hybrid import HybridModelConfig, HybridRNNTCTC
from ..train.driver import CLMethod
from ..train.state import TrainState, apply_updates
from ..train.step import (
    StepConfig,
    hybrid_forward_loss,
    hybrid_forward_tensors,
)
from ..utils.pytree import tree_zeros_like
from . import ewc as E
from . import lwf as L
from . import mas as M


class NaiveMethod(CLMethod):
    name = "naive"


@dataclasses.dataclass
class EWCMethod(CLMethod):
    """cl_baseline_ewc.py semantics; see cl/ewc.py."""

    cfg: E.EWCConfig
    model: HybridRNNTCTC
    model_cfg: HybridModelConfig
    step_cfg: StepConfig
    trainable_mask: object
    name: str = "ewc"

    def __post_init__(self):
        self.state = E.EWCState()
        model, model_cfg, step_cfg = self.model, self.model_cfg, self.step_cfg

        def fisher_batch(params, batch_stats, batch, rng):
            def loss_fn(p):
                loss, _ = hybrid_forward_loss(
                    model, model_cfg, step_cfg, p, batch_stats,
                    batch["audio"], batch["audio_len"], batch["tokens"],
                    batch["token_len"], batch["lang_ids"], rng, train=True,
                    n_valid=batch.get("n_valid"),
                )
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            return loss, grads

        self._fisher_batch = jax.jit(fisher_batch)

    def penalty_fn(self, task_idx: int):
        if task_idx == 0:
            return None
        return E.make_penalty_fn(self.cfg, self.state)

    def penalty_tree(self, task_idx: int):
        if (task_idx == 0 or self.state.main_fish is None
                or self.state.checkpoint is None):
            return None
        return {"fish": self.state.main_fish, "ckpt": self.state.checkpoint}

    def penalty_from_tree(self, tree, params):
        grads, _ = E.penalty_grads(
            self.cfg, tree["fish"], params, tree["ckpt"]
        )
        return jnp.zeros(()), grads

    def wants_importance_epoch(self) -> bool:
        return True

    def begin_importance(self, params):
        return tree_zeros_like(params)

    def importance_batch(self, acc, state: TrainState, batch, rng):
        loss, grads = self._fisher_batch(
            state.params, state.batch_stats, batch, rng
        )
        return E.accumulate_fisher(acc, grads, loss, batch["audio"].shape[0])

    def end_task(self, state: TrainState, acc, n_batches, total_utterances):
        self.state = E.end_task(
            self.cfg, self.state, acc, max(total_utterances, 1),
            state.params, self.trainable_mask,
        )

    def export_state(self):
        if self.state.main_fish is None:
            return None
        return {
            "main_fish": self.state.main_fish,
            "checkpoint": self.state.checkpoint,
        }

    def import_state(self, tree) -> None:
        if tree is not None:
            self.state = E.EWCState(
                main_fish=tree["main_fish"], checkpoint=tree["checkpoint"]
            )


@dataclasses.dataclass
class MASMethod(CLMethod):
    """cl_baseline_mas.py semantics; see cl/mas.py."""

    cfg: M.MASConfig
    model: HybridRNNTCTC
    model_cfg: HybridModelConfig
    step_cfg: StepConfig
    trainable_mask: object
    name: str = "mas"

    def __post_init__(self):
        self.state = M.MASState()
        model, model_cfg, step_cfg = self.model, self.model_cfg, self.step_cfg
        jcfg = model_cfg.joint_config()

        def surrogate_batch(params, batch_stats, batch, rng):
            def surrogate(p):
                variables = {"params": p, "batch_stats": batch_stats}
                from ..audio.features import log_mel_spectrogram

                mel, mel_lens = log_mel_spectrogram(
                    batch["audio"], batch["audio_len"], step_cfg.frontend,
                    training=False,
                )
                (f, enc_lens), _ = model.apply(
                    variables, mel, mel_lens, True, method="encode",
                    mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )
                g, _ = model.apply(
                    variables, batch["tokens"], True, None, False,
                    method="predict",
                )
                f_proj, g_proj = model.apply(
                    variables, f, g, method="joint_project"
                )
                hw = jnp.take(
                    p["joint"]["head_kernel"], batch["lang_ids"], axis=0
                )
                hb = jnp.take(
                    p["joint"]["head_bias"], batch["lang_ids"], axis=0
                )
                _, ctc_logits = model.apply(
                    variables, f, batch["lang_ids"], True,
                    method="ctc_logprobs",
                )
                n_valid = batch.get("n_valid")
                row_mask = (
                    jnp.arange(batch["audio"].shape[0]) < n_valid
                    if n_valid is not None else None
                )
                return M.mas_surrogate(
                    self.cfg, f_proj, g_proj, hw, hb, ctc_logits,
                    activation=jcfg.activation,
                    chunk_size=step_cfg.rnnt_chunk_size,
                    row_mask=row_mask,
                    uniform_head=step_cfg.uniform_lang_head,
                )

            return jax.grad(surrogate)(params)

        self._surrogate_batch = jax.jit(surrogate_batch)

    def penalty_fn(self, task_idx: int):
        if task_idx == 0:
            return None
        return M.make_penalty_fn(self.cfg, self.state)

    def penalty_tree(self, task_idx: int):
        if (task_idx == 0 or self.state.importance is None
                or self.state.checkpoint is None):
            return None
        return {"omega": self.state.importance,
                "ckpt": self.state.checkpoint}

    def penalty_from_tree(self, tree, params):
        return M.penalty(self.cfg, tree["omega"], params, tree["ckpt"]), None

    def wants_importance_epoch(self) -> bool:
        return True

    def begin_importance(self, params):
        return tree_zeros_like(params)

    def importance_batch(self, acc, state: TrainState, batch, rng):
        grads = self._surrogate_batch(
            state.params, state.batch_stats, batch, rng
        )
        return M.accumulate_importance(acc, grads)

    def end_task(self, state: TrainState, acc, n_batches, total_utterances):
        self.state = M.end_task(
            self.state, acc, max(n_batches, 1), state.params,
            self.trainable_mask,
        )

    def export_state(self):
        if self.state.importance is None:
            return None
        return {
            "importance": self.state.importance,
            "checkpoint": self.state.checkpoint,
        }

    def import_state(self, tree) -> None:
        if tree is not None:
            self.state = M.MASState(
                importance=tree["importance"], checkpoint=tree["checkpoint"]
            )


@dataclasses.dataclass
class LwFMethod(CLMethod):
    """cl_baseline_lwf.py semantics; see cl/lwf.py. Overrides the train
    step entirely: task loss + teacher/student KD per batch."""

    cfg: L.LwFConfig
    model: HybridRNNTCTC
    model_cfg: HybridModelConfig
    step_cfg: StepConfig
    tx: object
    name: str = "lwf"

    def __post_init__(self):
        self.state = L.LwFState()

    def make_train_step(self, base_builder: Callable, task_idx: int):
        if task_idx == 0 or self.state.teacher_params is None:
            return jax.jit(base_builder(None), donate_argnums=(0,))

        model, model_cfg, step_cfg = self.model, self.model_cfg, self.step_cfg
        lcfg = self.cfg
        jcfg = model_cfg.joint_config()
        # teacher enters the jitted program as an ARGUMENT (same hazard as
        # CLMethod.penalty_tree: a flagship-size closure pytree becomes HLO
        # constants and blows the tunneled remote-compile request limit)
        teacher_tree = {
            "params": self.state.teacher_params,
            "batch_stats": self.state.teacher_batch_stats,
        }
        tx = self.tx

        def lwf_step(state: TrainState, batch, rng, teacher):
            teacher_p = teacher["params"]
            teacher_bs = teacher["batch_stats"]
            k_task, k_teacher = jax.random.split(rng)

            def loss_fn(params):
                # ONE student forward feeds both the task loss and the KD
                # student side (ADVICE r1: the previous second forward both
                # doubled encoder cost and distilled a computation different
                # from the one being trained; the reference captures KD
                # tensors from the same training_step forward,
                # cl_baseline_lwf.py:236-239).
                task_loss, (aux, new_bs, pieces) = hybrid_forward_loss(
                    model, model_cfg, step_cfg, params, state.batch_stats,
                    batch["audio"], batch["audio_len"], batch["tokens"],
                    batch["token_len"], batch["lang_ids"], k_task,
                    train=True, return_pieces=True,
                    n_valid=batch.get("n_valid"),
                )
                fs, gs, ctc_s, hws, hbs = pieces
                n_valid = batch.get("n_valid")
                row_mask = (
                    jnp.arange(batch["audio"].shape[0]) < n_valid
                    if n_valid is not None else None
                )
                # teacher: train-mode forward with its own augmentation draw
                # (faithful: the reference runs the teacher through
                # training_step on a train()-mode model, cl_baseline_lwf.py:
                # 227-228 — SpecAugment + dropout active, different draw)
                kt = jax.random.split(k_teacher, 3)
                ft, gt, ctc_t, hwt, hbt, _, _, _ = hybrid_forward_tensors(
                    model, step_cfg, teacher_p, teacher_bs,
                    batch["audio"], batch["audio_len"], batch["tokens"],
                    batch["lang_ids"], kt[0], kt[1], kt[2], train=True,
                )
                ctc_kd = L.ctc_kd_loss(ctc_s, ctc_t, row_mask=row_mask)
                rnnt_kd = L.joint_kd_chunked(
                    fs, gs, ft, gt, hws, hbs, hwt, hbt,
                    activation=jcfg.activation,
                    chunk_size=step_cfg.rnnt_chunk_size,
                    faithful_raw_logits=lcfg.faithful_raw_logits,
                    row_mask=row_mask,
                    uniform_head=step_cfg.uniform_lang_head,
                )
                kd = lcfg.knowledge_distillation
                ctx = lcfg.knowledge_distillation_ctx
                loss = (1 - kd) * task_loss + kd * (
                    (1 - ctx) * rnnt_kd + ctx * ctc_kd
                )
                aux = dict(
                    aux, train_loss=loss, rnnt_kd=rnnt_kd, ctc_kd=ctc_kd
                )
                return loss, (aux, new_bs)

            (loss, (aux, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = tx.update(
                grads, state.opt_state, state.params
            )
            new_params = apply_updates(state.params, updates)
            return (
                TrainState(
                    step=state.step + 1, params=new_params,
                    batch_stats=new_bs, opt_state=new_opt,
                ),
                aux,
            )

        # state donated like the base step; the teacher tree holds
        # `jnp.array` COPIES of the previous task's params (lwf.end_task),
        # so donating the student state never invalidates the teacher.
        jitted = jax.jit(lwf_step, donate_argnums=(0,))

        def step(state, batch, rng):
            return jitted(state, batch, rng, teacher_tree)

        return step

    def end_task(self, state: TrainState, acc, n_batches, total_utterances):
        self.state = L.end_task(
            state.params, state.batch_stats,
            teacher_dtype=self.cfg.teacher_dtype,
        )

    def export_state(self):
        if self.state.teacher_params is None:
            return None
        return {
            "teacher_params": self.state.teacher_params,
            "teacher_batch_stats": self.state.teacher_batch_stats,
        }

    def import_state(self, tree) -> None:
        if tree is not None:
            self.state = L.LwFState(
                teacher_params=tree["teacher_params"],
                teacher_batch_stats=tree["teacher_batch_stats"],
            )
