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


def load_partial(path: str, params: Any) -> Any:
    """Non-strict restore of a partial save into a full param tree."""
    with np.load(path) as data:
        named = {k: data[k] for k in data.files}
    return tree_update_from_named(params, named)


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
        val_performance: dict,
    ) -> None:
        """Checkpoint the FULL TrainState (step/params/batch_stats/opt_state)
        so resume continues the optimizer, not just the weights (ADVICE r1:
        saving only {params, batch_stats} broke run_sequence's restore).
        Serialized via flax state-dicts so optax NamedTuple states become
        plain nested dicts orbax round-trips losslessly."""
        save_pytree(
            os.path.join(self.root, f"task_{task_idx}_{lang}"),
            serialization.to_state_dict(state),
        )
        m = self.manifest()
        if lang not in m["completed_tasks"]:
            m["completed_tasks"].append(lang)
        m["val_performance"] = val_performance
        with open(self._manifest_path, "w") as f:
            json.dump(m, f)

    def latest_task(self) -> tuple[int, str] | None:
        m = self.manifest()
        if not m["completed_tasks"]:
            return None
        idx = len(m["completed_tasks"]) - 1
        return idx, m["completed_tasks"][-1]

    def load_task(self, task_idx: int, lang: str, like: Any) -> Any:
        """Restore a full TrainState saved by save_task; `like` supplies the
        structure (a freshly-built TrainState with matching optimizer)."""
        restored = load_pytree(
            os.path.join(self.root, f"task_{task_idx}_{lang}"),
            serialization.to_state_dict(like),
        )
        return serialization.from_state_dict(like, restored)
