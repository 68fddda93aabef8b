"""Checkpointing: orbax pytree save/restore + partial (trainable-only) saves
and task-sequence resume.

Reference behavior preserved:
  * partial state-dict saves of trainable params only
    (utils.py:265-271 `save_model` -> model_<lang>.pth), restored
    non-strictly (cl_baseline_lwf.py:223) — here `save_partial` /
    `load_partial` over {path: array} dicts;
  * .nemo-style whole-model restore becomes an orbax checkpoint of the
    full variables pytree.

Improvements over the reference (SURVEY.md §5.3-5.4): optimizer state and
the CL task index are checkpointed too, so a crashed 9-language sequence
resumes instead of restarting.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization

from .pytree import mask_select, named_leaves, tree_update_from_named


def save_pytree(path: str, tree: Any) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, tree), force=True)


def load_pytree(path: str, like: Any | None = None) -> Any:
    ckptr = ocp.PyTreeCheckpointer()
    if like is not None:
        restored = ckptr.restore(
            os.path.abspath(path),
            args=ocp.args.PyTreeRestore(jax.tree.map(np.asarray, like)),
        )
    else:
        restored = ckptr.restore(os.path.abspath(path))
    return restored


def save_partial(path: str, params: Any, trainable_mask: Any) -> None:
    """Trainable-subset save as an .npz of {path: array}."""
    subset = mask_select(params, trainable_mask)
    np.savez(path, **{k: np.asarray(v) for k, v in subset.items()})


def _restack_named(
    named: dict, n_layers: int, target: dict | None = None
) -> dict:
    """{encoder/layers_<i>/...: arr} -> {encoder/stack/layers/...: [L,...]}

    A partial save with a frozen prefix legitimately contains only the
    trainable layers (e.g. 12..16 of 17); missing rows are filled from
    ``target`` — the destination tree's existing stacked leaves — when
    provided (ADVICE r2: raising here broke frozen-prefix partial saves
    restored into the scanned layout). Without ``target`` all layers must
    be present."""
    import re

    groups: dict[tuple[str, str], dict[int, Any]] = {}
    out = {}
    for k, v in named.items():
        m = re.match(r"(.*encoder)/layers_(\d+)/(.*)", k)
        if m:
            groups.setdefault((m.group(1), m.group(3)), {})[
                int(m.group(2))
            ] = v
        else:
            out[k] = v
    for (prefix, suffix), by_layer in groups.items():
        stacked_path = f"{prefix}/stack/layers/{suffix}"
        tgt = target.get(stacked_path) if target is not None else None
        L = (tgt.shape[0] if tgt is not None
             else (n_layers or 1 + max(by_layer)))
        missing = [i for i in range(L) if i not in by_layer]
        if missing and tgt is None:
            raise ValueError(
                f"partial save misses encoder layers for {suffix}: "
                f"have {sorted(by_layer)} (no target tree to fill from)"
            )
        rows = [
            by_layer[i] if i in by_layer else np.asarray(tgt[i])
            for i in range(L)
        ]
        out[stacked_path] = np.stack(rows)
    return out


def _unstack_named(named: dict) -> dict:
    """{encoder/stack/layers/...: [L,...]} -> {encoder/layers_<i>/...}"""
    import re

    out = {}
    for k, v in named.items():
        m = re.match(r"(.*encoder)/stack/layers/(.*)", k)
        if m:
            for i in range(v.shape[0]):
                out[f"{m.group(1)}/layers_{i}/{m.group(2)}"] = v[i]
        else:
            out[k] = v
    return out


def load_partial(path: str, params: Any) -> Any:
    """Non-strict restore of a partial save into a full param tree.

    Transparently converts between the unrolled (`encoder/layers_<i>`) and
    scanned (`encoder/stack/layers` with a leading [L] axis) encoder
    layouts, so partial saves restore across `scan_layers` settings."""
    with np.load(path) as data:
        named = {k: data[k] for k in data.files}
    target_paths = set(named_leaves(params).keys())
    target_scan = any("/stack/layers/" in p for p in target_paths)
    saved_scan = any("/stack/layers/" in k for k in named)
    saved_unrolled = any(
        "encoder/layers_" in k for k in named
    )
    if target_scan and saved_unrolled:
        named = _restack_named(named, 0, target=named_leaves(params))
    elif not target_scan and saved_scan:
        named = _unstack_named(named)
    return tree_update_from_named(params, named)


def _convert_state_layout(raw: dict, like_sd: dict) -> dict:
    """Adapt a full-TrainState state-dict saved in one encoder layout
    (unrolled `encoder/layers_<i>` vs scanned `encoder/stack/layers`) to
    the other. params/batch_stats/step convert exactly; opt_state is kept
    from ``like_sd`` (fresh) because the masked vs stacked-freeze
    optimizer layouts are not mutually convertible."""
    import warnings

    out = dict(like_sd)
    for key in ("params", "batch_stats"):
        if key in raw and key in like_sd:
            named_raw = named_leaves(raw[key])
            target_named = named_leaves(like_sd[key])
            target_scan = any("/stack/layers/" in p for p in target_named)
            saved_scan = any("/stack/layers/" in k for k in named_raw)
            if target_scan and not saved_scan:
                named_raw = _restack_named(named_raw, 0, target=target_named)
            elif saved_scan and not target_scan:
                named_raw = _unstack_named(named_raw)
            out[key] = tree_update_from_named(like_sd[key], named_raw)
    if "step" in raw:
        out["step"] = raw["step"]
    warnings.warn(
        "sequence checkpoint was saved in a different encoder layout "
        "(scan_layers changed); params/batch_stats converted, optimizer "
        "state restarted fresh. Pass --model.scan_layers matching the "
        "checkpoint to resume the optimizer too.",
        stacklevel=2,
    )
    return out


class SequenceCheckpointer:
    """Task-sequence checkpoint manager: per-task full state + a manifest
    recording progress, enabling resume of the CL language sequence."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self._manifest_path = os.path.join(self.root, "sequence.json")

    def manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"completed_tasks": [], "val_performance": {}}

    def save_task(
        self, task_idx: int, lang: str, state: Any,
        val_performance: dict, method_state: Any | None = None,
    ) -> None:
        """Checkpoint the FULL TrainState (step/params/batch_stats/opt_state)
        so resume continues the optimizer, not just the weights (ADVICE r1:
        saving only {params, batch_stats} broke run_sequence's restore).
        Serialized via flax state-dicts so optax NamedTuple states become
        plain nested dicts orbax round-trips losslessly.

        ``method_state`` (review r2): the CL algorithm's own state
        (EWC Fisher/theta*, MAS Omega, LwF teacher) — without it a resumed
        EWC/MAS/LwF sequence silently degrades to naive fine-tuning.

        Multihost: EVERY process calls this with the SAME (shared) root —
        orbax writes from the primary host and coordinates the others;
        the manifest is written by the main process only, with a barrier
        so every process sees a complete task snapshot afterwards."""
        from ..parallel.distributed import barrier, is_main_process

        save_pytree(
            os.path.join(self.root, f"task_{task_idx}_{lang}"),
            serialization.to_state_dict(state),
        )
        if method_state is not None:
            save_pytree(
                os.path.join(self.root, f"task_{task_idx}_{lang}_method"),
                method_state,
            )
        if is_main_process():
            m = self.manifest()
            if lang not in m["completed_tasks"]:
                m["completed_tasks"].append(lang)
            m["val_performance"] = val_performance
            with open(self._manifest_path, "w") as f:
                json.dump(m, f)
        barrier(f"save_task_{task_idx}")

    def load_method_state(self, task_idx: int, lang: str) -> Any | None:
        path = os.path.join(self.root, f"task_{task_idx}_{lang}_method")
        if not os.path.exists(path):
            return None
        return load_pytree(path)

    def latest_task(self) -> tuple[int, str] | None:
        m = self.manifest()
        if not m["completed_tasks"]:
            return None
        idx = len(m["completed_tasks"]) - 1
        return idx, m["completed_tasks"][-1]

    def load_task(self, task_idx: int, lang: str, like: Any) -> Any:
        """Restore a full TrainState saved by save_task; `like` supplies the
        structure (a freshly-built TrainState with matching optimizer).

        Cross-layout resume (ADVICE r2: scan_layers default flipped to
        True in round 2, so pre-existing sequence checkpoints are in the
        unrolled layout): on structure mismatch, params/batch_stats/step
        are converted between the unrolled and scanned encoder layouts;
        the optimizer state cannot be converted across the
        masked/stacked-freeze layouts and restarts fresh from ``like``
        (warned)."""
        path = os.path.join(self.root, f"task_{task_idx}_{lang}")
        like_sd = serialization.to_state_dict(like)
        try:
            restored = load_pytree(path, like_sd)
        except Exception:
            raw = load_pytree(path)
            restored = _convert_state_layout(raw, like_sd)
        return serialization.from_state_dict(like, restored)
