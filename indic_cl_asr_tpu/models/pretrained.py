"""Checkpoint conversion: NeMo `.nemo` / torch state dicts -> our variables.

The reference loads `ai4bharat/indicconformer_stt_hi_hybrid_rnnt_large` via
NeMo's SaveRestoreConnector (reference: core/connectors/
save_restore_connector.py:220, a tar of model_config.yaml +
model_weights.ckpt; cl_baseline.py:122). This module maps that torch state
dict onto our Flax parameter tree so WER parity against the pretrained
model is testable without NeMo.

Layout mappings (torch -> flax):
  Conv2d   [O, I, kh, kw]            -> kernel [kh, kw, I, O]
  Conv1d k=1 (pointwise/CTC head)    [O, I, 1] -> kernel [I, O]
  depthwise Conv1d [C, 1, k]         -> kernel [k, 1, C]
  Linear   [O, I]                    -> kernel [I, O]
  LSTM     weight_ih_l0 [4H, I]      -> w_ih [I, 4H];  bias = b_ih + b_hh
  subsampling out-proj: NeMo flattens conv output channel-major (C, F)
  (subsampling.py forward: transpose(1,2).reshape), ours feature-major
  (F, C) — the input dim of the dense is permuted accordingly.
  per-language joint heads: ModuleDict[lang] Linears -> stacked
  [L, H, V+1] kernel (+ [L, V+1] bias), ordered by the tokenizer's
  language order.
"""

from __future__ import annotations

import io
import os
import tarfile
from typing import Mapping

import numpy as np

import jax


def _t(x):
    return np.asarray(x).T


def _conv2d(x):
    return np.transpose(np.asarray(x), (2, 3, 1, 0))


def _pointwise1d(x):
    return np.asarray(x)[:, :, 0].T


def _depthwise1d(x):
    return np.transpose(np.asarray(x), (2, 1, 0))


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read model_weights.ckpt from a .nemo tar (or a bare .ckpt/.pth)."""
    import torch

    if path.endswith(".nemo") or tarfile.is_tarfile(path):
        with tarfile.open(path) as tar:
            names = [
                m.name for m in tar.getmembers()
                if m.name.endswith(("model_weights.ckpt", ".ckpt", ".pt"))
            ]
            assert names, f"no weights member found in {path}"
            f = tar.extractfile(names[0])
            sd = torch.load(io.BytesIO(f.read()), map_location="cpu")
    else:
        sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def convert_nemo_state_dict(
    sd: Mapping[str, np.ndarray],
    *,
    n_layers: int,
    sampling_num: int,
    subsampled_feat: int,
    conv_channels: int,
    language_keys: list[str],
    scan_layers: bool = False,
) -> dict:
    """NeMo hybrid RNNT+CTC BPE state dict -> {"params", "batch_stats"}.

    With ``scan_layers`` the per-layer encoder subtrees are stacked along a
    leading [L] axis under ``encoder/stack/layers`` (the lax.scan layout of
    models/conformer.py ConformerLayerStack)."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, np.float32)

    # ---- encoder: subsampling ----
    enc = {}
    conv_idx = 0
    for i in range(sampling_num):
        w = sd[f"encoder.pre_encode.conv.{conv_idx}.weight"]
        b = sd[f"encoder.pre_encode.conv.{conv_idx}.bias"]
        put(enc, (f"conv_{i}", "kernel"), _conv2d(w))
        put(enc, (f"conv_{i}", "bias"), b)
        conv_idx += 2  # Conv2d, ReLU pairs
    # out-projection: permute torch's channel-major (C, F) flatten to our
    # feature-major (F, C)
    w = np.asarray(sd["encoder.pre_encode.out.weight"])  # [d, C*F]
    C, F = conv_channels, subsampled_feat
    w = w.reshape(-1, C, F).transpose(0, 2, 1).reshape(-1, F * C)
    put(enc, ("out", "kernel"), w.T)
    put(enc, ("out", "bias"), sd["encoder.pre_encode.out.bias"])
    params["encoder"] = {"pre_encode": enc}

    # ---- encoder layers ----
    for i in range(n_layers):
        p = f"encoder.layers.{i}."
        layer: dict = {}
        for ln in (
            "norm_feed_forward1", "norm_self_att", "norm_conv",
            "norm_feed_forward2", "norm_out",
        ):
            put(layer, (ln, "scale"), sd[p + ln + ".weight"])
            put(layer, (ln, "bias"), sd[p + ln + ".bias"])
        for ff in ("feed_forward1", "feed_forward2"):
            for lin in ("linear1", "linear2"):
                put(layer, (ff, lin, "kernel"), _t(sd[p + f"{ff}.{lin}.weight"]))
                put(layer, (ff, lin, "bias"), sd[p + f"{ff}.{lin}.bias"])
        att = {}
        for lin in ("linear_q", "linear_k", "linear_v", "linear_out"):
            put(att, (lin, "kernel"), _t(sd[p + f"self_attn.{lin}.weight"]))
            put(att, (lin, "bias"), sd[p + f"self_attn.{lin}.bias"])
        put(att, ("linear_pos", "kernel"), _t(sd[p + "self_attn.linear_pos.weight"]))
        att["pos_bias_u"] = np.asarray(sd[p + "self_attn.pos_bias_u"], np.float32)
        att["pos_bias_v"] = np.asarray(sd[p + "self_attn.pos_bias_v"], np.float32)
        layer["self_attn"] = att
        conv = {}
        put(conv, ("pointwise_conv1", "kernel"),
            _pointwise1d(sd[p + "conv.pointwise_conv1.weight"]))
        put(conv, ("pointwise_conv1", "bias"), sd[p + "conv.pointwise_conv1.bias"])
        put(conv, ("depthwise_conv", "kernel"),
            _depthwise1d(sd[p + "conv.depthwise_conv.weight"]))
        put(conv, ("depthwise_conv", "bias"), sd[p + "conv.depthwise_conv.bias"])
        put(conv, ("batch_norm", "scale"), sd[p + "conv.batch_norm.weight"])
        put(conv, ("batch_norm", "bias"), sd[p + "conv.batch_norm.bias"])
        put(conv, ("pointwise_conv2", "kernel"),
            _pointwise1d(sd[p + "conv.pointwise_conv2.weight"]))
        put(conv, ("pointwise_conv2", "bias"), sd[p + "conv.pointwise_conv2.bias"])
        layer["conv"] = conv
        params["encoder"][f"layers_{i}"] = layer

        put(stats, ("encoder", f"layers_{i}", "conv", "batch_norm", "mean"),
            sd[p + "conv.batch_norm.running_mean"])
        put(stats, ("encoder", f"layers_{i}", "conv", "batch_norm", "var"),
            sd[p + "conv.batch_norm.running_var"])

    if scan_layers:
        per_layer = [params["encoder"].pop(f"layers_{i}")
                     for i in range(n_layers)]
        params["encoder"]["stack"] = {
            "layers": jax.tree.map(lambda *a: np.stack(a), *per_layer)
        }
        per_stats = [stats["encoder"].pop(f"layers_{i}")
                     for i in range(n_layers)]
        stats["encoder"]["stack"] = {
            "layers": jax.tree.map(lambda *a: np.stack(a), *per_stats)
        }

    # ---- prediction net ----
    pred = {"embedding": np.asarray(
        sd["decoder.prediction.embed.weight"], np.float32
    )}
    layer_idx = 0
    while f"decoder.prediction.dec_rnn.lstm.weight_ih_l{layer_idx}" in sd:
        lp = f"decoder.prediction.dec_rnn.lstm."
        pred[f"lstm_{layer_idx}"] = {
            "w_ih": _t(sd[lp + f"weight_ih_l{layer_idx}"]).astype(np.float32),
            "w_hh": _t(sd[lp + f"weight_hh_l{layer_idx}"]).astype(np.float32),
            "bias": (
                np.asarray(sd[lp + f"bias_ih_l{layer_idx}"])
                + np.asarray(sd[lp + f"bias_hh_l{layer_idx}"])
            ).astype(np.float32),
        }
        layer_idx += 1
    params["prediction"] = pred

    # ---- joint ----
    joint = {
        "enc": {"kernel": _t(sd["joint.enc.weight"]).astype(np.float32),
                "bias": np.asarray(sd["joint.enc.bias"], np.float32)},
        "pred": {"kernel": _t(sd["joint.pred.weight"]).astype(np.float32),
                 "bias": np.asarray(sd["joint.pred.bias"], np.float32)},
    }
    # final layer: per-language ModuleDict (5-part keys
    # joint.joint_net.<i>.<lang>.weight) or plain single-softmax Linear
    # (4-part keys joint.joint_net.<i>.weight — take the HIGHEST Sequential
    # index; earlier indices would be intermediate linears). ADVICE r1
    # (medium): the 4-part case was previously unreachable.
    head_idx = None
    single_indices: list[int] = []
    for k in sd:
        if k.startswith("joint.joint_net.") and k.endswith(".weight"):
            parts = k.split(".")
            if len(parts) == 5:
                head_idx = parts[2]
                break
            if len(parts) == 4:
                single_indices.append(int(parts[2]))
    if head_idx is None and single_indices:
        head_idx = str(max(single_indices))
    assert head_idx is not None, "no joint final layer found"
    if any(f"joint.joint_net.{head_idx}.{l}.weight" in sd
           for l in language_keys):
        ws, bs = [], []
        for lang in language_keys:
            ws.append(_t(sd[f"joint.joint_net.{head_idx}.{lang}.weight"]))
            bs.append(np.asarray(sd[f"joint.joint_net.{head_idx}.{lang}.bias"]))
        joint["head_kernel"] = np.stack(ws).astype(np.float32)  # [L, H, V+1]
        joint["head_bias"] = np.stack(bs).astype(np.float32)
    else:  # single-softmax checkpoint: replicate the one head per language
        w = _t(sd[f"joint.joint_net.{head_idx}.weight"])
        b = np.asarray(sd[f"joint.joint_net.{head_idx}.bias"])
        joint["head_kernel"] = np.repeat(
            w[None], len(language_keys), axis=0
        ).astype(np.float32)
        joint["head_bias"] = np.repeat(
            b[None], len(language_keys), axis=0
        ).astype(np.float32)
    params["joint"] = joint

    # ---- ctc head ----
    params["ctc_decoder"] = {
        "kernel": _pointwise1d(
            sd["ctc_decoder.decoder_layers.0.weight"]
        ).astype(np.float32),
        "bias": np.asarray(
            sd["ctc_decoder.decoder_layers.0.bias"], np.float32
        ),
    }

    return {
        "params": jax.tree.map(np.asarray, params),
        "batch_stats": jax.tree.map(np.asarray, stats),
    }


def load_pretrained(nemo_path: str, model_cfg) -> dict:
    """One-call restore: .nemo file -> variables for HybridRNNTCTC."""
    from .conformer import subsampled_feat_dim

    sd = load_torch_state_dict(nemo_path)
    lang_keys = [
        "hi", "bn", "mr", "te", "ta", "ur", "gu", "kn", "or", "ml", "pa",
        "sa",
    ][: model_cfg.n_langs]
    return convert_nemo_state_dict(
        sd,
        n_layers=model_cfg.encoder.n_layers,
        sampling_num=model_cfg.encoder.sampling_num,
        subsampled_feat=subsampled_feat_dim(model_cfg.encoder),
        conv_channels=model_cfg.encoder.conv_channels,
        language_keys=lang_keys,
        scan_layers=model_cfg.encoder.scan_layers,
    )
