"""SPMD mesh + sharding rules.

TPU-native replacement for the reference's distributed stack
(reference: torch DDP + NCCL + SyncBatchNorm + DistributedSampler,
cl_baseline.py:33-48,133-134 — see SURVEY.md §2.3/§5.8). There are no
explicit collectives here: parameters and batches get NamedShardings on a
`jax.sharding.Mesh` and GSPMD inserts all-reduces (gradients ride the data
axis, tensor-parallel matmul partials ride the model axis) over ICI.

Mesh axes:
  * "data"  — batch (DP). Gradient all-reduce; BatchNorm stats are computed
    on the global batch view, so SyncBatchNorm comes for free.
  * "model" — tensor parallelism (TP) over attention heads / FFN hidden /
    vocab heads (Megatron-style column->row pairs on the Conformer FFN and
    attention projections, vocab sharding on embedding + heads).

The reference exercises world size 1 (SURVEY.md §2.3); this module is the
scale-out path the reference never had.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


# (regex over '/'-joined param path) -> PartitionSpec. First match wins.
# Column-parallel layers shard the OUTPUT dim; the following row-parallel
# layer shards the INPUT dim, so the pair needs one psum (inserted by GSPMD).
PARAM_RULES: list[tuple[str, P]] = [
    # Conformer FFN: linear1 column-parallel, linear2 row-parallel
    (r"feed_forward\d/linear1/kernel$", P(None, "model")),
    (r"feed_forward\d/linear2/kernel$", P("model", None)),
    (r"feed_forward\d/linear1/bias$", P("model")),
    # attention: q/k/v column-parallel over heads, out row-parallel
    (r"self_attn/linear_[qkv]/kernel$", P(None, "model")),
    (r"self_attn/linear_[qkv]/bias$", P("model")),
    (r"self_attn/linear_pos/kernel$", P(None, "model")),
    (r"self_attn/linear_out/kernel$", P("model", None)),
    # conv module pointwise convs (dense here): column then row
    (r"conv/pointwise_conv1/kernel$", P(None, "model")),
    (r"conv/pointwise_conv2/kernel$", P("model", None)),
    # prediction-net embedding: vocab-sharded
    (r"prediction/embedding$", P("model", None)),
    # LSTM: shard the 4H gate dim
    (r"lstm_\d/w_ih$", P(None, "model")),
    (r"lstm_\d/w_hh$", P(None, "model")),
    (r"lstm_\d/bias$", P("model")),
    # joint projections column-parallel, per-language heads vocab-sharded
    (r"joint/(enc|pred)/kernel$", P(None, "model")),
    (r"joint/head_kernel$", P(None, None, "model")),
    (r"joint/head_bias$", P(None, "model")),
    # CTC head vocab-sharded
    (r"ctc_decoder/kernel$", P(None, "model")),
    (r"ctc_decoder/bias$", P("model")),
]


def _spec_for_path(path: str, use_model_axis: bool) -> P:
    if use_model_axis:
        for pattern, spec in PARAM_RULES:
            if re.search(pattern, path):
                if "stack/layers/" in path:
                    # scanned-encoder leaves carry a leading [L] layer
                    # axis: shift the spec right by one (replicate L)
                    return P(None, *spec)
                return spec
    return P()  # replicated


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings matching `params` (PARAM_RULES + replicate).
    Falls back to full replication for leaves whose sharded dim is not
    divisible by the model-axis size."""
    use_model = mesh.shape.get("model", 1) > 1
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def path_str(path):
        return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)

    out = []
    n_model = mesh.shape.get("model", 1)
    for path, leaf in flat:
        spec = _spec_for_path(path_str(path), use_model)
        # divisibility guard
        ok = True
        for dim, axis in enumerate(spec):
            if axis == "model" and leaf.shape[dim] % n_model != 0:
                ok = False
        out.append(NamedSharding(mesh, spec if ok else P()))
    return jax.tree_util.tree_unflatten(treedef, out)


def batch_shardings(batch: Any, mesh: Mesh) -> Any:
    """Leading axis of every array in the batch dict over the data axis;
    scalars (e.g. the `n_valid` row count) replicate."""
    return jax.tree.map(
        lambda x: NamedSharding(
            mesh,
            P("data", *([None] * (x.ndim - 1))) if x.ndim >= 1 else P(),
        ),
        batch,
    )


def place_batch(batch: Any, mesh: Mesh) -> Any:
    """Put a host batch dict onto the mesh, data-axis sharded.

    Single-controller (tests, one-host TPU slices like v5e-8): a plain
    device_put. Multi-host (scripts/launch_tpu.sh pods): every process is
    expected to have assembled the IDENTICAL global batch — the drivers'
    BatchPipeline is deterministic in (entries, seed), and build_data does
    not shard entries per host — and each process contributes the rows its
    devices own via `make_array_from_callback` (the jax.Array analogue of
    the reference's DistributedSampler + DDP input contract,
    cl_baseline.py:133-134)."""
    shardings = batch_shardings(batch, mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, shardings)

    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree.map(put, batch, shardings)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tree_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for ANY state tree by path rules.

    Works for the whole TrainState: optimizer mu/nu paths contain the param
    path as a suffix (e.g. `opt_state/1/0/mu/encoder/.../kernel`), so the
    same PARAM_RULES shard them identically; scalars and unmatched leaves
    replicate. Leaves whose sharded dim is not divisible by the model-axis
    size fall back to replication.
    """
    use_model = mesh.shape.get("model", 1) > 1
    n_model = mesh.shape.get("model", 1)
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)

    def path_str(path):
        return "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path
        )

    out = []
    for path, leaf in flat:
        spec = _spec_for_path(path_str(path), use_model)
        shape = getattr(leaf, "shape", ())
        ok = len(spec) <= len(shape)
        if ok:
            for dim, axis in enumerate(spec):
                if axis == "model" and shape[dim] % n_model != 0:
                    ok = False
        out.append(NamedSharding(mesh, spec if ok else P()))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState on the mesh per PARAM_RULES (replicate the rest)."""
    return jax.device_put(state, tree_shardings(state, mesh))
