"""Parameter-pytree utilities: named access, trainable masks, partial saves.

Replaces the reference's ``{name: tensor}`` dict helpers and freeze policy
(reference: utils.py:246-321 — freeze_layer/save_model/get_params/get_grads/
set_grads). In JAX, params are immutable pytrees; "freezing" becomes a boolean
mask pytree consumed by ``optax.masked`` (and optionally ``stop_gradient``
inside the model for compute savings), and "grad dicts" are just grad pytrees.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp


def named_leaves(tree: Any, sep: str = "/") -> dict[str, Any]:
    """Flatten a pytree to {path: leaf} with readable '/'-joined paths."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        out[sep.join(parts)] = leaf
    return out


def path_mask(tree: Any, predicate: Callable[[str], bool]) -> Any:
    """Boolean pytree: leaf -> predicate('/'-joined path)."""
    paths = jax.tree_util.tree_flatten_with_path(tree)
    leaves_with_path, treedef = paths

    def path_str(path):
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        return "/".join(parts)

    mask_leaves = [predicate(path_str(path)) for path, _ in leaves_with_path]
    return jax.tree_util.tree_unflatten(treedef, mask_leaves)


def regex_mask(tree: Any, trainable_patterns: list[str]) -> Any:
    """True where any regex matches the leaf path (searched, not anchored)."""
    compiled = [re.compile(p) for p in trainable_patterns]
    return path_mask(tree, lambda p: any(c.search(p) for c in compiled))


def conformer_freeze_mask(params: Any, freeze_encoder_till: int) -> Any:
    """Trainable mask reproducing the reference freeze policy.

    Reference utils.py:246-263 freezes the mel preprocessor and encoder
    blocks with index < ``freeze_encoder_till`` (including the subsampling
    pre-encode when any layer is frozen). Our encoder params live under
    ``encoder/layers_<i>/...`` and ``encoder/pre_encode/...``.

    With the scanned encoder (``encoder/stack/layers`` holding [L, ...]
    stacked leaves) a leaf-level mask cannot split the frozen prefix from
    the trainable suffix — the stack is marked trainable here and the
    per-row freeze is enforced by the model's stop-gradient cut (zero
    grads) plus ``make_optimizer(stacked_freeze_till=...)`` (zeroed
    updates, neutralizing AdamW weight decay on frozen rows).
    """
    layer_re = re.compile(r"encoder/(?:layers|blocks)[_/](\d+)(?:/|$)")

    def trainable(path: str) -> bool:
        if freeze_encoder_till <= 0:
            return True
        m = layer_re.search(path)
        if m is not None:
            return int(m.group(1)) >= freeze_encoder_till
        if "encoder/stack/" in path:
            return True  # per-row handling: see docstring
        if "pre_encode" in path or "pos_enc" in path:
            return False
        return True

    return path_mask(params, trainable)


def mask_select(tree: Any, mask: Any) -> dict[str, Any]:
    """{path: leaf} for leaves where mask is True — the partial 'state dict'
    save of reference utils.py:265-271 (only requires_grad params)."""
    named = named_leaves(tree)
    mnamed = named_leaves(mask)
    return {k: v for k, v in named.items() if mnamed[k]}


def tree_update_from_named(tree: Any, named: Mapping[str, Any], sep: str = "/") -> Any:
    """Non-strict load: replace leaves whose path appears in ``named``.

    Equivalent of the reference's ``load_state_dict(..., strict=False)``
    (cl_baseline_lwf.py:223)."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)

    def path_str(path):
        parts = []
        for p in path:
            parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
        return sep.join(parts)

    new_leaves = [
        named.get(path_str(path), leaf) for path, leaf in paths_and_leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def tree_zeros_like(tree: Any) -> Any:
    return jax.tree.map(jnp.zeros_like, tree)


def tree_where_mask(mask: Any, a: Any, b: Any) -> Any:
    """Per-leaf select: mask ? a : b (mask is a bool pytree)."""
    return jax.tree.map(lambda m, x, y: x if m else y, mask, a, b)


def count_params(tree: Any) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(tree))
