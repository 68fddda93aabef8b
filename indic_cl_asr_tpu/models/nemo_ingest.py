"""One-call ingestion of a real `.nemo` checkpoint (config + weights +
tokenizers), plus an optional HuggingFace download path.

The reference starts every experiment from
`ASRModel.from_pretrained("ai4bharat/indicconformer_stt_hi_hybrid_rnnt_large")`
(reference: cl_baseline.py:122), which downloads a `.nemo` tar and restores
it via SaveRestoreConnector (core/connectors/save_restore_connector.py:220).
A `.nemo` tar holds:

  model_config.yaml      — the full Hydra config the modules were built from
  model_weights.ckpt     — torch state dict
  <hash>_tokenizer.model — per-language SentencePiece models, referenced
                           from the config as `nemo:<hash>_tokenizer.model`
                           under tokenizer.langs.<lang>.model_path
                           (parts/mixins/mixins.py:250-256 register_artifact)

This module maps all three onto our stack: config -> HybridModelConfig,
weights -> Flax variables (models/pretrained.py), tokenizer artifacts ->
MultilingualTokenizer over SentencePieceTokenizer adapters (gated on the
sentencepiece library, absent in this image — the extraction still works so
artifacts are ready the moment the library is).
"""

from __future__ import annotations

import os
import tarfile

from .hybrid import HybridModelConfig
from .conformer import ConformerConfig


def read_nemo_config(nemo_path: str) -> dict:
    """model_config.yaml from the .nemo tar -> plain dict."""
    import yaml

    with tarfile.open(nemo_path) as tar:
        names = [m.name for m in tar.getmembers()
                 if m.name.endswith("model_config.yaml")]
        assert names, f"no model_config.yaml inside {nemo_path}"
        f = tar.extractfile(names[0])
        return yaml.safe_load(f.read())


def model_config_from_nemo(cfg: dict, dtype=None) -> HybridModelConfig:
    """Map the .nemo Hydra config onto HybridModelConfig.

    Field sources: encoder.* (conformer_hybrid_transducer_ctc_bpe.yaml
    §encoder), decoder/joint hidden sizes (rnnt.py RNNTDecoder/RNNTJoint
    configs), aggregate vocab = sum of per-language vocab slices (the CTC
    head's num_classes, conv_asr.py:402+ / hybrid_rnnt_ctc_bpe_models.py:
    102-134 multisoftmax block).
    """
    import jax.numpy as jnp

    enc = cfg["encoder"]
    langs = list(cfg.get("tokenizer", {}).get("langs", {}) or {})
    n_langs = len(langs) or 12

    # aggregate vocab: the CTC decoder's num_classes counts real tokens
    # (blank is appended on top). Real hybrid configs store it under
    # aux_ctc.decoder.num_classes (hybrid_rnnt_ctc_bpe_models.py:86-92,
    # conformer_hybrid_transducer_ctc_bpe.yaml:183-190 — the -1
    # placeholder is replaced with len(vocabulary) at restore and the
    # mutated config is what gets saved into the .nemo); joint
    # num_classes is per-lang V in the multisoftmax fork
    # (hybrid_rnnt_ctc_bpe_models.py:112-124)
    vocab_total = (
        cfg.get("aux_ctc", {}).get("decoder", {}).get("num_classes")
        or cfg.get("ctc_decoder", {}).get("num_classes")
        or cfg.get("decoder", {}).get("vocab_size")
    )
    if not vocab_total or vocab_total <= 0:
        per_lang = cfg.get("joint", {}).get("num_classes", 256)
        if not per_lang or per_lang <= 0:  # -1 placeholder in saved cfgs
            per_lang = 256
        vocab_total = per_lang * n_langs

    sub_channels = enc.get("subsampling_conv_channels", -1) or -1
    encoder = ConformerConfig(
        feat_in=enc.get("feat_in", 80),
        n_layers=enc.get("n_layers", 17),
        d_model=enc.get("d_model", 512),
        n_heads=enc.get("n_heads", 8),
        ff_expansion_factor=enc.get("ff_expansion_factor", 4),
        conv_kernel_size=enc.get("conv_kernel_size", 31),
        conv_norm_type=enc.get("conv_norm_type", "batch_norm"),
        subsampling_factor=enc.get("subsampling_factor", 4),
        subsampling_conv_channels=sub_channels,
        dropout=enc.get("dropout", 0.1),
        dropout_pre_encoder=enc.get("dropout_pre_encoder", 0.1),
        dropout_emb=enc.get("dropout_emb", 0.0),
        dropout_att=enc.get("dropout_att", 0.1),
        xscale=bool(enc.get("xscale", True)),
        pos_emb_max_len=enc.get("pos_emb_max_len", 5000),
        dtype=dtype if dtype is not None else jnp.float32,
    )

    dec = cfg.get("decoder", {})
    prednet = dec.get("prednet", {}) if isinstance(dec, dict) else {}
    joint = cfg.get("joint", {})
    jointnet = joint.get("jointnet", {}) if isinstance(joint, dict) else {}
    return HybridModelConfig(
        encoder=encoder,
        vocab_size_total=int(vocab_total),
        n_langs=n_langs,
        pred_hidden=prednet.get("pred_hidden", 640),
        pred_rnn_layers=prednet.get("pred_rnn_layers", 1),
        joint_hidden=jointnet.get("joint_hidden", 640),
        joint_activation=jointnet.get("activation", "relu"),
        ctc_loss_weight=cfg.get("aux_ctc", {}).get("ctc_loss_weight", 0.5),
        dtype=dtype if dtype is not None else jnp.float32,
    )


def extract_tokenizer_models(
    nemo_path: str, out_dir: str, cfg: dict | None = None
) -> dict[str, str]:
    """Pull each language's SentencePiece .model out of the tar.

    Returns {lang: extracted_path}, ordered as the config lists languages
    (this order defines head/vocab-slice order everywhere downstream).
    ``cfg`` avoids re-scanning the tar when the caller already parsed the
    model config (a ~2 GB .nemo costs a full member scan per parse)."""
    cfg = cfg if cfg is not None else read_nemo_config(nemo_path)
    langs_cfg = cfg.get("tokenizer", {}).get("langs", {}) or {}
    os.makedirs(out_dir, exist_ok=True)
    out: dict[str, str] = {}
    with tarfile.open(nemo_path) as tar:
        members = {os.path.basename(m.name): m for m in tar.getmembers()}
        for lang, tcfg in langs_cfg.items():
            ref = tcfg.get("model_path") or os.path.join(
                tcfg.get("dir", ""), "tokenizer.model"
            )
            base = os.path.basename(ref.removeprefix("nemo:"))
            m = members.get(base)
            if m is None:
                # older checkpoints: artifacts under <lang>/tokenizer.model
                cands = [
                    mm for name, mm in members.items()
                    if name.endswith("tokenizer.model") and f"/{lang}/" in mm.name
                ]
                m = cands[0] if cands else None
            assert m is not None, (
                f"tokenizer model for {lang!r} ({ref!r}) not found in tar"
            )
            dst = os.path.join(out_dir, f"{lang}_tokenizer.model")
            with tar.extractfile(m) as src, open(dst, "wb") as w:
                w.write(src.read())
            out[lang] = dst
    return out


def build_tokenizer_from_nemo(nemo_path: str, work_dir: str, cfg: dict | None = None):
    """MultilingualTokenizer over the checkpoint's real SentencePiece
    models, loaded by the pure-Python ModelProto reader
    (data/spm_model.py) — no sentencepiece library needed."""
    from ..data.tokenizer import MultilingualTokenizer, SentencePieceTokenizer

    paths = extract_tokenizer_models(nemo_path, work_dir, cfg=cfg)
    toks = {lang: SentencePieceTokenizer(p) for lang, p in paths.items()}
    return MultilingualTokenizer(toks)


def download_from_hf(repo_id: str, cache_dir: str | None = None) -> str:
    """HF-hub download of a .nemo artifact (reference from_pretrained path,
    core/classes/modelPT.py). Requires network egress."""
    from huggingface_hub import hf_hub_download, list_repo_files

    files = list_repo_files(repo_id)
    nemo = [f for f in files if f.endswith(".nemo")]
    assert nemo, f"no .nemo file in {repo_id}: {files}"
    return hf_hub_download(repo_id, nemo[0], cache_dir=cache_dir)


def restore_pretrained(
    nemo_path: str,
    work_dir: str,
    dtype=None,
    with_tokenizer: bool = True,
):
    """.nemo -> (model, variables, model_cfg, tokenizer_or_None).

    The full restore pipeline: parse config, build the Flax model, convert
    the torch state dict (models/pretrained.py layout mappings), and load
    the SentencePiece tokenizers when possible.
    """
    import jax

    from .hybrid import HybridRNNTCTC, init_model
    from .pretrained import load_pretrained

    cfg = read_nemo_config(nemo_path)
    model_cfg = model_config_from_nemo(cfg, dtype=dtype)
    model = HybridRNNTCTC(model_cfg)
    variables = load_pretrained(nemo_path, model_cfg)
    # shape-check the converted tree against a fresh init
    ref_shapes = jax.eval_shape(
        lambda: init_model(model_cfg, jax.random.PRNGKey(0))[1]
    )
    got = jax.tree_util.tree_flatten_with_path(variables)[0]
    want = jax.tree_util.tree_flatten_with_path(ref_shapes)[0]
    bad = [
        (jax.tree_util.keystr(kg), tuple(vg.shape), tuple(vw.shape))
        for (kg, vg), (_, vw) in zip(got, want)
        if tuple(vg.shape) != tuple(vw.shape)
    ]
    assert len(got) == len(want) and not bad, (
        f"converted tree mismatches model: {bad[:5]}"
    )
    tokenizer = None
    if with_tokenizer:
        tokenizer = build_tokenizer_from_nemo(nemo_path, work_dir, cfg=cfg)
    return model, variables, model_cfg, tokenizer
