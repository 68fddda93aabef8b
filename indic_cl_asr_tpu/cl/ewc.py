"""Elastic Weight Consolidation as functional pytree transforms.

Reference semantics (cl_baseline_ewc.py):
  * while training task t>0, the quadratic penalty enters as GRADIENTS
    added to the task gradients before the optimizer step
    (:228-231 set_grads before backward; grads accumulate):
        g_penalty = 2 * e_lambda * F * (theta - theta*)        (:69-81)
  * after each task's training epochs, ONE extra pass over the data
    accumulates the Fisher diagonal (:245-269):
        fish += loss_value * grad(task_loss)^2    per batch
        fish /= total_utterances
    and merges it with decay into the running Fisher (:272-280):
        main_fish = e_gamma * main_fish + fish
  * theta* (checkpoint) is the post-task parameter clone (:282), trainable
    leaves only.

Here each piece is a pure jitted tree-map over parameter pytrees; the
"+1 epoch" runs the same forward/backward step function with the optimizer
update skipped (driver loop, scripts/cl_ewc.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..utils.pytree import tree_where_mask, tree_zeros_like


@dataclasses.dataclass
class EWCConfig:
    e_lambda: float = 10.0
    e_gamma: float = 1.0


@dataclasses.dataclass
class EWCState:
    """main_fish/checkpoint are pytrees shaped like params (zeros/None
    before the first task completes)."""

    main_fish: Any = None
    checkpoint: Any = None


def penalty_grads(
    cfg: EWCConfig, main_fish: Any, params: Any, checkpoint: Any
) -> tuple[Any, jnp.ndarray]:
    """(grads pytree, mean |penalty grad| monitor) — cl_baseline_ewc.py:69-81."""
    grads = jax.tree.map(
        lambda f, p, c: 2.0 * cfg.e_lambda * f * (p - c),
        main_fish, params, checkpoint,
    )
    leaves = jax.tree.leaves(grads)
    monitor = sum(jnp.mean(jnp.abs(l)) for l in leaves) / max(len(leaves), 1)
    return grads, monitor


def accumulate_fisher(fish: Any, grads: Any, loss_value, batch_size: int) -> Any:
    """fish += loss * grad^2 (one batch) — cl_baseline_ewc.py:245-260.
    ``loss_value`` is the scalar batch loss (exp_cond_prob in the
    reference)."""
    del batch_size  # normalization happens in finalize_fisher
    return jax.tree.map(
        lambda f, g: f + loss_value * g * g, fish, grads
    )


def finalize_fisher(fish: Any, total_utterances: int) -> Any:
    return jax.tree.map(lambda f: f / total_utterances, fish)


def merge_fisher(cfg: EWCConfig, main_fish: Any, fish: Any) -> Any:
    if main_fish is None:
        return fish
    return jax.tree.map(
        lambda m, f: cfg.e_gamma * m + f, main_fish, fish
    )


def end_task(
    cfg: EWCConfig, state: EWCState, fish: Any, total_utterances: int,
    params: Any, trainable_mask: Any,
) -> EWCState:
    """Finalize a task: normalize + merge Fisher, snapshot theta*.
    Frozen leaves carry zero fisher so their penalty grads vanish."""
    fish = finalize_fisher(fish, total_utterances)
    fish = tree_where_mask(trainable_mask, fish, tree_zeros_like(fish))
    return EWCState(
        main_fish=merge_fisher(cfg, state.main_fish, fish),
        checkpoint=jax.tree.map(jnp.array, params),
    )


def make_penalty_fn(cfg: EWCConfig, state: EWCState):
    """For train/step.py's penalty hook: returns (0 scalar, penalty grads)
    — EWC's penalty enters as gradients, not as a loss term."""
    if state.main_fish is None or state.checkpoint is None:
        return None

    def penalty_fn(params):
        grads, _ = penalty_grads(cfg, state.main_fish, params, state.checkpoint)
        return jnp.zeros(()), grads

    return penalty_fn
