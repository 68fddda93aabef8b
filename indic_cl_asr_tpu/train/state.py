"""Train state + optimizer with trainable-mask freezing.

Replaces the reference's AdamW-over-requires_grad-params setup
(reference: cl_baseline.py:137 `AdamW(lr=1e-4)` + utils.py:246-263
`freeze_layer`): freezing is an `optax.masked` boolean pytree (see
utils/pytree.py `conformer_freeze_mask`) plus the encoder's stop-gradient
cut, and the state is an immutable pytree that shards/checkpoints cleanly.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def _stacked_path(path, path_substr: str) -> bool:
    parts = "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )
    return path_substr in parts


def row_sliced_stacked(
    inner: optax.GradientTransformation,
    n_rows: int,
    path_substr: str = "encoder/stack/layers",
) -> optax.GradientTransformation:
    """Run ``inner`` only on rows [n_rows:] of every stacked encoder leaf.

    With scan_layers the frozen encoder prefix lives inside [L, ...]
    stacked leaves. Masking alone still makes AdamW hold and rewrite
    mu/nu/params for all L rows every step — ~2/3 wasted HBM traffic at
    the reference working point (12 of 17 layers frozen; the optimizer
    fusions are HBM-bound in the op profile). Slicing matches the
    reference exactly: its AdamW only ever sees requires_grad params
    (cl_baseline.py:137, utils.py:246-263), so frozen rows have no
    optimizer state there either.

    The returned updates stay SLICED ([L - n_rows, ...] on stacked
    leaves): apply them with this module's :func:`apply_updates`, which
    adds them in place with ``p.at[n_rows:].add(u)``. The earlier design
    concatenated an explicit zero prefix back to [L, ...]; XLA lowered
    ``p + pad(u)`` as a full pass over every stacked param leaf
    (~1.5 GB/step of pad_add traffic in the op profile — reading and
    rewriting 12 frozen rows of every leaf to add zero). The in-place
    row add touches only the trainable rows; frozen rows are never
    read or written by the update, so they still truly never change
    (including weight decay).
    """

    def _slice(tree):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: (
                x[n_rows:]
                if hasattr(x, "ndim") and _stacked_path(p, path_substr)
                else x
            ),
            tree,
        )

    def init(params):
        return inner.init(_slice(params))

    def update(updates, state, params=None):
        u_s, new_state = inner.update(
            _slice(updates), state,
            _slice(params) if params is not None else None,
        )
        return u_s, new_state

    return optax.GradientTransformation(init, update)


def apply_updates(
    params: Any, updates: Any, path_substr: str = "encoder/stack/layers"
) -> Any:
    """`optax.apply_updates` that understands row-sliced stacked updates.

    Stacked-encoder leaves (path contains ``path_substr``, the same
    contract as :func:`row_sliced_stacked`) whose update is shorter than
    the param along axis 0 are applied with an in-place suffix-row add —
    only the trainable rows are read or written. The row-add is gated on
    the PATH, not just the shape: a shape mismatch anywhere else raises
    instead of being silently misread as a sliced update. Everything else
    matches optax semantics (cast to the param dtype; ``None`` updates
    leave the param untouched)."""

    def leaf(path, p, u):
        if u is None:
            return p
        p = jnp.asarray(p)
        u = jnp.asarray(u)
        if u.shape != p.shape:
            if (
                _stacked_path(path, path_substr)
                and u.ndim == p.ndim
                and u.ndim >= 1
                and u.shape[0] < p.shape[0]
                and u.shape[1:] == p.shape[1:]
            ):
                n = p.shape[0] - u.shape[0]
                return p.at[n:].add(u.astype(p.dtype))
            raise ValueError(
                f"apply_updates: update shape {u.shape} != param shape "
                f"{p.shape} at {jax.tree_util.keystr(path)} (row-sliced "
                f"updates are only legal under '{path_substr}')"
            )
        return (p + u).astype(p.dtype)

    return jax.tree_util.tree_map_with_path(
        leaf, params, updates, is_leaf=lambda x: x is None
    )


def zero_stacked_prefix(
    n_rows: int, path_substr: str = "encoder/stack/layers"
) -> optax.GradientTransformation:
    """Zero the leading ``n_rows`` of every update leaf under the scanned
    encoder stack (leaves are [L, ...] with layer as axis 0).

    With scan_layers the frozen encoder prefix lives INSIDE stacked leaves,
    so leaf-level masking can't freeze it. Gradients for those rows are
    already exactly zero (the model's stop-gradient cut); this transform
    additionally kills AdamW's gradient-independent weight-decay term so
    frozen rows truly never change — matching the reference's
    requires_grad=False freeze (utils.py:246-263)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        def fix(path, u):
            if not hasattr(u, "ndim"):  # e.g. optax.MaskedNode
                return u
            parts = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            if path_substr in parts:
                keep = (
                    jnp.arange(u.shape[0]) >= n_rows
                ).reshape((-1,) + (1,) * (u.ndim - 1))
                return u * keep.astype(u.dtype)
            return u

        return jax.tree_util.tree_map_with_path(fix, updates), state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 0.01,  # torch AdamW default, used by the drivers
    trainable_mask: Any | None = None,
    grad_clip: float | None = None,
    stacked_freeze_till: int = 0,
) -> optax.GradientTransformation:
    txs = []
    if grad_clip:
        txs.append(optax.clip_by_global_norm(grad_clip))
    txs.append(
        optax.adamw(
            lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
        )
    )
    tx = optax.chain(*txs)
    if stacked_freeze_till > 0:
        # scanned-encoder frozen prefix: AdamW state and updates exist
        # only for the trainable rows (see row_sliced_stacked); the
        # frozen rows get an explicit zero update, so weight decay never
        # touches them (previously zero_stacked_prefix's job)
        tx = row_sliced_stacked(tx, stacked_freeze_till)
    if trainable_mask is not None:
        # frozen leaves must get ZERO updates (optax.masked would pass raw
        # gradients through unchanged for masked-out leaves)
        labels = jax.tree.map(
            lambda t: "train" if t else "freeze", trainable_mask
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx


def create_train_state(
    variables: dict, tx: optax.GradientTransformation
) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )
