"""Shared continual-learning experiment driver.

The reference has four near-identical driver scripts (cl_baseline.py,
cl_baseline_ewc.py, cl_baseline_mas.py, cl_baseline_lwf.py; see SURVEY.md
§3.1/§3.4/§3.5). Here the sequence loop is ONE driver parameterized by a
CL method object; scripts/cl_*.py are thin entry points.

Flow per task (language):
  build entries -> epochs of jitted train steps
  [EWC/MAS: +1 importance epoch with no optimizer update]
  -> eval matrix over all seen languages (clean+noisy x rnnt/ctc)
  -> BWT logging -> partial weight save -> task checkpoint (resumable).

Faithful-vs-fixed notes (documented; see also docs/PARITY.md):
  * eval runs after the last TRAINING epoch, i.e. before the importance
    epoch, matching the reference's `epoch == epochs-1` timing
    (cl_baseline_ewc.py:288);
  * LwF's teacher is an in-memory pytree (reference re-loads from disk
    every batch).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.manifest import ManifestEntry
from ..data.pipeline import BatchPipeline, BucketSpec
from ..models.hybrid import HybridModelConfig, HybridRNNTCTC
from ..train import metrics as M
from ..train.eval import Transcriber, run_eval
from ..train.logger import Logger
from ..train.state import TrainState
from ..train.step import StepConfig, batch_to_device_dict
from ..utils.checkpoint import SequenceCheckpointer, save_partial

LANGUAGES = [
    "hindi", "bengali", "marathi", "telugu", "tamil", "urdu",
    "gujarati", "kannada", "odia", "malayalam", "punjabi", "sanskrit",
]
SHORT_FORM = [
    "hi", "bn", "mr", "te", "ta", "ur", "gu", "kn", "or", "ml", "pa", "sa",
]


@dataclasses.dataclass
class TaskData:
    train: Sequence[ManifestEntry]
    val_clean: Sequence[ManifestEntry]
    val_noisy: Sequence[ManifestEntry]
    test_clean: Sequence[ManifestEntry]
    test_noisy: Sequence[ManifestEntry]


class CLMethod:
    """Interface for CL algorithms plugged into the driver."""

    name = "naive"

    def penalty_fn(self, task_idx: int):
        """Optional penalty hook for the train step (params -> (loss, grads))."""
        return None

    def penalty_tree(self, task_idx: int):
        """Large pytrees the penalty needs (Fisher/Omega importances +
        anchor params). When non-None, make_train_step passes this tree
        to the jitted step as an ARGUMENT and builds the penalty from it
        via :meth:`penalty_from_tree` — closing a penalty_fn over
        flagship-size pytrees embeds ~250M numbers as program CONSTANTS,
        which blows the tunneled remote-compile request limit (observed
        HTTP 413 on the first on-device EWC task-2 step) and bloats the
        HLO everywhere else."""
        return None

    def penalty_from_tree(self, tree, params):
        """params + penalty_tree -> (penalty_loss, penalty_grads_or_None);
        must not close over any large arrays."""
        raise NotImplementedError

    def wants_importance_epoch(self) -> bool:
        return False

    def begin_importance(self, params):
        return None

    def importance_batch(self, acc, state, batch, rng):
        return acc

    def end_task(self, state: TrainState, acc, n_batches: int,
                 total_utterances: int):
        pass

    def make_train_step(self, base_builder: Callable, task_idx: int):
        """Return the jitted step for this task (rebuilt per task because
        the penalty closure changes).

        The incoming TrainState is DONATED: XLA reuses the old
        params/opt-state buffers for the new ones, halving the step's
        peak HBM for state and removing ~1.5 GB/step of copy traffic at
        flagship size. Callers must treat a stepped-over state as dead
        (the driver's `state, aux = step(state, ...)` loop does); CL
        snapshots (EWC/MAS theta*, LwF teacher) are `jnp.array` copies,
        so they survive donation of the state they came from.

        Penalty state enters the jitted program as an ARGUMENT (see
        :meth:`penalty_tree`), never as a closure constant."""
        ptree = self.penalty_tree(task_idx)
        if ptree is not None:
            pf = self.penalty_from_tree

            def step_with_tree(state, batch, rng, ptree):
                fn = base_builder(lambda params: pf(ptree, params))
                return fn(state, batch, rng)

            jitted = jax.jit(step_with_tree, donate_argnums=(0,))

            def step(state, batch, rng):
                return jitted(state, batch, rng, ptree)

            return step
        return jax.jit(
            base_builder(self.penalty_fn(task_idx)), donate_argnums=(0,)
        )

    def export_state(self):
        """Algorithm state to checkpoint with the task (Fisher/Omega/
        teacher); None = stateless. Restored via import_state on resume —
        without this, a resumed EWC/MAS/LwF sequence would silently
        continue as naive fine-tuning."""
        return None

    def import_state(self, tree) -> None:
        pass


@dataclasses.dataclass
class DriverConfig:
    batch_size: int = 16
    epochs: int = 1
    seed: int = 42
    n_langs: int = 9
    save_weights: bool = True
    output_dir: str = "outputs"
    evaluate_every_n_epochs: int = 0  # 0 = only at end of task
    bucket_spec: BucketSpec | None = None


def run_sequence(
    *,
    cfg: DriverConfig,
    model: HybridRNNTCTC,
    model_cfg: HybridModelConfig,
    step_cfg: StepConfig,
    state: TrainState,
    method: CLMethod,
    base_step_builder: Callable,
    task_data: dict[str, TaskData],
    tokenizer,
    logger: Logger,
    trainable_mask,
    transcriber: Transcriber | None = None,
    checkpointer: SequenceCheckpointer | None = None,
    languages: Sequence[str] | None = None,
    mesh=None,
) -> dict:
    """Sequential CL over languages. Returns the val-performance dict
    ({lang: [perf-record per task]}) used for BWT analysis.

    ``mesh`` (a `jax.sharding.Mesh` with "data"/"model" axes, built by
    `parallel.sharding.make_mesh`): when given, the TrainState is sharded
    per PARAM_RULES and every batch is placed data-axis-sharded; the SAME
    jitted step then runs SPMD — GSPMD inserts the gradient all-reduces
    (DP) and tensor-parallel collectives (TP), replacing the reference's
    DDP/NCCL wrap (cl_baseline.py:133-134). Eval and the importance epoch
    run on the sharded state unchanged."""
    languages = list(languages or LANGUAGES[: cfg.n_langs])
    transcriber = transcriber or Transcriber(
        model=model, model_cfg=model_cfg, tokenizer=tokenizer,
        languages=languages, frontend=step_cfg.frontend,
        batch_size=cfg.batch_size, bucket_spec=cfg.bucket_spec,
        mesh=mesh,
    )
    val_performance: dict[str, list] = {l: [] for l in languages}
    test_performance: dict[str, list] = {l: [] for l in languages}
    key = jax.random.PRNGKey(cfg.seed)

    start_idx = 0
    if checkpointer is not None:
        latest = checkpointer.latest_task()
        if latest is not None:
            idx, lang = latest
            state = checkpointer.load_task(idx, lang, state)
            method.import_state(checkpointer.load_method_state(idx, lang))
            m = checkpointer.manifest()
            for l, recs in m["val_performance"].items():
                if l in val_performance:
                    val_performance[l] = recs
            start_idx = idx + 1
            logger.log({"resumed_from_task": idx, "resumed_lang": lang})

    if mesh is not None:
        from ..parallel.sharding import place_batch, shard_train_state

        state = shard_train_state(state, mesh)
        to_device = lambda b: place_batch(batch_to_device_dict(b), mesh)  # noqa: E731
    else:
        to_device = batch_to_device_dict

    if step_cfg.uniform_lang_head:
        # the jitted loss applies lang_ids[0]'s head to the whole batch
        # (StepConfig.uniform_lang_head) — cheap host check that every
        # batch really is single-language, which per-task manifests
        # guarantee by construction
        _inner_to_device = to_device

        def to_device(b):  # noqa: F811
            ids = b.lang_ids
            if (ids != ids[0]).any():
                raise ValueError(
                    "uniform_lang_head=True but the batch mixes languages "
                    f"({sorted(set(ids.tolist()))}); set "
                    "step.uniform_lang_head=False for mixed batches"
                )
            return _inner_to_device(b)

    for lang_idx in range(start_idx, len(languages)):
        lang = languages[lang_idx]
        data = task_data[lang]
        step = method.make_train_step(base_step_builder, lang_idx)

        pipe = BatchPipeline(
            data.train, tokenizer, languages, cfg.batch_size,
            spec=cfg.bucket_spec, shuffle=True, seed=cfg.seed + lang_idx,
        )

        for epoch in range(cfg.epochs):
            t0 = time.time()
            n_utts = 0
            for batch in pipe:
                key, sub = jax.random.split(key)
                state, aux = step(state, to_device(batch), sub)
                n_utts += batch.n_real
                logger.log(
                    {f"train/{k}_{lang}": v for k, v in aux.items()}
                    | {"epoch": epoch, "lang": lang_idx}
                )
            logger.log_epoch_average()
            dt = time.time() - t0
            logger.log({
                f"train/epoch_time_{lang}": dt,
                f"train/utts_per_sec_{lang}": n_utts / max(dt, 1e-9),
            })
            if (
                cfg.evaluate_every_n_epochs
                and (epoch + 1) % cfg.evaluate_every_n_epochs == 0
                and epoch != cfg.epochs - 1
            ):
                _eval_all(
                    logger, transcriber, state, task_data, languages,
                    lang_idx, epoch, val_performance, test_performance,
                    record=False,
                )

        # eval BEFORE the importance epoch (reference timing)
        _eval_all(
            logger, transcriber, state, task_data, languages, lang_idx,
            cfg.epochs - 1, val_performance, test_performance, record=True,
        )

        if method.wants_importance_epoch():
            acc = method.begin_importance(state.params)
            n_batches = 0
            total_utts = 0
            for batch in pipe:
                key, sub = jax.random.split(key)
                acc = method.importance_batch(
                    acc, state, to_device(batch), sub
                )
                n_batches += 1
                total_utts += batch.n_real
            method.end_task(state, acc, n_batches, total_utts)
        else:
            method.end_task(state, None, 0, 0)

        # BWT curves after each task (utils.py:213-243 / cl_baseline.py:220-243)
        curves = M.compute_bwt_curves(val_performance)
        for l, pts in curves.items():
            for t, b in pts:
                logger.log({f"bwt/{l}": b, "bwt_task": t})
        logger.log_bwt_curves(curves)  # wandb scatter/line + bwt_curves.json

        if cfg.save_weights:
            # replicated params are identical on every host; one writer
            from ..parallel.distributed import is_main_process

            if is_main_process():
                save_partial(
                    f"{logger.dir}/model_{lang}.npz", state.params,
                    trainable_mask,
                )
        if checkpointer is not None:
            checkpointer.save_task(
                lang_idx, lang, state, val_performance,
                method_state=method.export_state(),
            )

    return {"val": val_performance, "test": test_performance}


def _eval_all(
    logger, transcriber, state, task_data, languages, lang_idx, epoch,
    val_performance, test_performance, record: bool,
):
    variables = {
        "params": state.params, "batch_stats": state.batch_stats
    }
    for i in range(lang_idx + 1):
        lang = languages[i]
        data = task_data[lang]
        perf_v = run_eval(
            logger, "val", transcriber, variables,
            data.val_clean, data.val_noisy, epoch, lang_idx, lang,
        )
        perf_t = run_eval(
            logger, "test", transcriber, variables,
            data.test_clean, data.test_noisy, epoch, lang_idx, lang,
        )
        if record:
            val_performance[lang].append(perf_v)
            test_performance[lang].append(perf_t)
