"""Checkpoint-converter layout tests: build torch modules with NeMo's
naming/layouts, convert, and check numerical parity of our Flax modules
(the de-risking step for real .nemo restores, SURVEY.md §7 hard-part 4)."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from indic_cl_asr_tpu.models.conformer import (
    ConformerConfig,
    ConvSubsampling,
    subsampled_feat_dim,
)
from indic_cl_asr_tpu.models.hybrid import init_model, tiny_config
from indic_cl_asr_tpu.models.pretrained import (
    _conv2d,
    _depthwise1d,
    _pointwise1d,
    _t,
    convert_nemo_state_dict,
)


def test_subsampling_parity_with_torch_channel_major_flatten(rng):
    cfg = ConformerConfig(
        feat_in=16, d_model=24, subsampling_factor=4,
        subsampling_conv_channels=8,
    )
    C = cfg.conv_channels
    F4 = subsampled_feat_dim(cfg)

    conv0 = torch.nn.Conv2d(1, C, 3, stride=2, padding=1)
    conv1 = torch.nn.Conv2d(C, C, 3, stride=2, padding=1)
    out = torch.nn.Linear(C * F4, cfg.d_model)

    x = torch.randn(2, 20, cfg.feat_in)  # [B, T, F]
    with torch.no_grad():
        h = torch.relu(conv0(x.unsqueeze(1)))
        h = torch.relu(conv1(h))             # [B, C, T4, F4]
        flat = h.transpose(1, 2).reshape(2, h.shape[2], -1)  # NeMo flatten
        want = out(flat).numpy()

    params = {
        "conv_0": {"kernel": jnp.asarray(_conv2d(conv0.weight.detach())),
                   "bias": jnp.asarray(conv0.bias.detach().numpy())},
        "conv_1": {"kernel": jnp.asarray(_conv2d(conv1.weight.detach())),
                   "bias": jnp.asarray(conv1.bias.detach().numpy())},
        "out": {},
    }
    w = out.weight.detach().numpy()
    w_perm = w.reshape(-1, C, F4).transpose(0, 2, 1).reshape(-1, F4 * C)
    params["out"]["kernel"] = jnp.asarray(w_perm.T)
    params["out"]["bias"] = jnp.asarray(out.bias.detach().numpy())

    got = ConvSubsampling(cfg).apply(
        {"params": params}, jnp.asarray(x.numpy())
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_depthwise_and_pointwise_conv_layouts(rng):
    d, k, T = 6, 5, 11
    x = torch.randn(2, d, T)
    pw = torch.nn.Conv1d(d, 2 * d, 1)
    dw = torch.nn.Conv1d(d, d, k, padding=k // 2, groups=d)
    with torch.no_grad():
        want_pw = pw(x).transpose(1, 2).numpy()
        want_dw = dw(x).transpose(1, 2).numpy()

    xj = jnp.asarray(x.transpose(1, 2).numpy())  # [B, T, d]
    got_pw = xj @ jnp.asarray(_pointwise1d(pw.weight.detach())) + jnp.asarray(
        pw.bias.detach().numpy()
    )
    np.testing.assert_allclose(np.asarray(got_pw), want_pw, atol=1e-5)

    import flax.linen as nn

    conv = nn.Conv(d, (k,), padding=((k // 2, k // 2),),
                   feature_group_count=d)
    got_dw = conv.apply(
        {"params": {"kernel": jnp.asarray(_depthwise1d(dw.weight.detach())),
                    "bias": jnp.asarray(dw.bias.detach().numpy())}},
        xj,
    )
    np.testing.assert_allclose(np.asarray(got_dw), want_dw, atol=1e-5)


def make_fake_nemo_sd(cfg, lang_keys, rng):
    """Random state dict with NeMo's key naming for the tiny config."""
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.1
    d = cfg.encoder.d_model
    ff = cfg.encoder.d_ff
    H = cfg.pred_hidden
    J = cfg.joint_hidden
    V1 = cfg.vocab_per_lang + 1
    C = cfg.encoder.conv_channels
    k = cfg.encoder.conv_kernel_size
    sd = {}
    sd["encoder.pre_encode.conv.0.weight"] = r(C, 1, 3, 3)
    sd["encoder.pre_encode.conv.0.bias"] = r(C)
    sd["encoder.pre_encode.conv.2.weight"] = r(C, C, 3, 3)
    sd["encoder.pre_encode.conv.2.bias"] = r(C)
    F4 = subsampled_feat_dim(cfg.encoder)
    sd["encoder.pre_encode.out.weight"] = r(d, C * F4)
    sd["encoder.pre_encode.out.bias"] = r(d)
    for i in range(cfg.encoder.n_layers):
        p = f"encoder.layers.{i}."
        for ln in ("norm_feed_forward1", "norm_self_att", "norm_conv",
                   "norm_feed_forward2", "norm_out"):
            sd[p + ln + ".weight"] = r(d)
            sd[p + ln + ".bias"] = r(d)
        for f in ("feed_forward1", "feed_forward2"):
            sd[p + f + ".linear1.weight"] = r(ff, d)
            sd[p + f + ".linear1.bias"] = r(ff)
            sd[p + f + ".linear2.weight"] = r(d, ff)
            sd[p + f + ".linear2.bias"] = r(d)
        for lin in ("linear_q", "linear_k", "linear_v", "linear_out"):
            sd[p + f"self_attn.{lin}.weight"] = r(d, d)
            sd[p + f"self_attn.{lin}.bias"] = r(d)
        sd[p + "self_attn.linear_pos.weight"] = r(d, d)
        sd[p + "self_attn.pos_bias_u"] = r(
            cfg.encoder.n_heads, d // cfg.encoder.n_heads
        )
        sd[p + "self_attn.pos_bias_v"] = r(
            cfg.encoder.n_heads, d // cfg.encoder.n_heads
        )
        sd[p + "conv.pointwise_conv1.weight"] = r(2 * d, d, 1)
        sd[p + "conv.pointwise_conv1.bias"] = r(2 * d)
        sd[p + "conv.depthwise_conv.weight"] = r(d, 1, k)
        sd[p + "conv.depthwise_conv.bias"] = r(d)
        sd[p + "conv.batch_norm.weight"] = r(d)
        sd[p + "conv.batch_norm.bias"] = r(d)
        sd[p + "conv.batch_norm.running_mean"] = r(d)
        sd[p + "conv.batch_norm.running_var"] = np.abs(r(d)) + 1.0
        sd[p + "conv.pointwise_conv2.weight"] = r(d, d, 1)
        sd[p + "conv.pointwise_conv2.bias"] = r(d)
    sd["decoder.prediction.embed.weight"] = r(cfg.vocab_size_total + 1, H)
    sd["decoder.prediction.dec_rnn.lstm.weight_ih_l0"] = r(4 * H, H)
    sd["decoder.prediction.dec_rnn.lstm.weight_hh_l0"] = r(4 * H, H)
    sd["decoder.prediction.dec_rnn.lstm.bias_ih_l0"] = r(4 * H)
    sd["decoder.prediction.dec_rnn.lstm.bias_hh_l0"] = r(4 * H)
    sd["joint.enc.weight"] = r(J, cfg.encoder.d_model)
    sd["joint.enc.bias"] = r(J)
    sd["joint.pred.weight"] = r(J, H)
    sd["joint.pred.bias"] = r(J)
    for lang in lang_keys:
        sd[f"joint.joint_net.2.{lang}.weight"] = r(V1, J)
        sd[f"joint.joint_net.2.{lang}.bias"] = r(V1)
    sd["ctc_decoder.decoder_layers.0.weight"] = r(
        cfg.vocab_size_total + 1, d, 1
    )
    sd["ctc_decoder.decoder_layers.0.bias"] = r(cfg.vocab_size_total + 1)
    return sd


def test_full_state_dict_converts_and_runs(rng):
    cfg = tiny_config()
    lang_keys = ["hi", "bn", "mr", "te"]
    sd = make_fake_nemo_sd(cfg, lang_keys, rng)
    variables = convert_nemo_state_dict(
        sd,
        n_layers=cfg.encoder.n_layers,
        sampling_num=cfg.encoder.sampling_num,
        subsampled_feat=subsampled_feat_dim(cfg.encoder),
        conv_channels=cfg.encoder.conv_channels,
        language_keys=lang_keys,
    )
    # the converted tree must be structurally identical to a fresh init
    model, init_vars = init_model(cfg, jax.random.PRNGKey(0))
    conv_paths = jax.tree_util.tree_structure(variables["params"])
    init_paths = jax.tree_util.tree_structure(init_vars["params"])
    assert conv_paths == init_paths
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables["params"])[0],
        jax.tree_util.tree_flatten_with_path(init_vars["params"])[0],
    ):
        assert np.shape(a) == np.shape(b), (pa, np.shape(a), np.shape(b))

    # forward runs with converted weights
    feats = jnp.asarray(
        rng.standard_normal((2, cfg.encoder.feat_in, 32)), jnp.float32
    )
    joint, ctc, enc_lens = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        feats, jnp.array([32, 24]), jnp.zeros((2, 5), jnp.int32),
        jnp.array([0, 1]),
    )
    assert np.isfinite(np.asarray(joint)).all()
    assert np.isfinite(np.asarray(ctc)).all()

    # per-language head routing preserved: lang 0 head == sd['...hi...']
    w_hi = _t(sd["joint.joint_net.2.hi.weight"])
    np.testing.assert_allclose(
        variables["params"]["joint"]["head_kernel"][0], w_hi, atol=1e-6
    )


def test_lstm_bias_summing(rng):
    # converter folds b_ih + b_hh into one bias; verify against torch LSTM
    from indic_cl_asr_tpu.models.rnnt import LSTM

    D = H = 6
    tl = torch.nn.LSTM(D, H, batch_first=True)
    x = torch.randn(1, 4, D)
    with torch.no_grad():
        want, _ = tl(x)
    params = {
        "w_ih": jnp.asarray(_t(tl.weight_ih_l0.detach())),
        "w_hh": jnp.asarray(_t(tl.weight_hh_l0.detach())),
        "bias": jnp.asarray(
            (tl.bias_ih_l0 + tl.bias_hh_l0).detach().numpy()
        ),
    }
    got, _ = LSTM(H).apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_single_softmax_state_dict_converts(rng):
    """Single-softmax checkpoints (plain Linear head, 4-part key) replicate
    the one head per language (ADVICE r1 medium: this branch was previously
    unreachable)."""
    cfg = tiny_config()
    lang_keys = ["hi", "bn", "mr", "te"]
    sd = make_fake_nemo_sd(cfg, lang_keys, rng)
    V1, J = cfg.vocab_per_lang + 1, cfg.joint_hidden
    for lang in lang_keys:
        del sd[f"joint.joint_net.2.{lang}.weight"]
        del sd[f"joint.joint_net.2.{lang}.bias"]
    # intermediate linear at a LOWER index must not be picked as the head
    sd["joint.joint_net.0.weight"] = rng.standard_normal(
        (J, J)
    ).astype(np.float32)
    sd["joint.joint_net.0.bias"] = rng.standard_normal(J).astype(np.float32)
    sd["joint.joint_net.2.weight"] = rng.standard_normal(
        (V1, J)
    ).astype(np.float32)
    sd["joint.joint_net.2.bias"] = rng.standard_normal(V1).astype(np.float32)

    variables = convert_nemo_state_dict(
        sd,
        n_layers=cfg.encoder.n_layers,
        sampling_num=cfg.encoder.sampling_num,
        subsampled_feat=subsampled_feat_dim(cfg.encoder),
        conv_channels=cfg.encoder.conv_channels,
        language_keys=lang_keys,
    )
    hk = variables["params"]["joint"]["head_kernel"]
    assert hk.shape == (len(lang_keys), J, V1)
    want = _t(sd["joint.joint_net.2.weight"])
    for l in range(len(lang_keys)):
        np.testing.assert_allclose(hk[l], want, atol=1e-6)


def test_full_encoder_stack_parity_with_torch_oracle(rng):
    """End-to-end numerical parity: a from-scratch torch replica of the NeMo
    Conformer encoder (subsampling + xscale + rel-pos + 2 full layers, eval
    mode) vs our Flax encoder fed through the checkpoint converter
    (VERDICT r1 item 3a — catches sign/convention errors in rel-pos
    attention that per-module layout tests cannot)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_conformer_oracle import OracleConformerEncoder

    cfg = tiny_config()
    torch.manual_seed(0)
    oracle = OracleConformerEncoder(cfg.encoder).eval()
    # make every weight non-trivial, incl. rel-pos biases and BN stats
    with torch.no_grad():
        for p in oracle.parameters():
            p.add_(0.05 * torch.randn_like(p))
        for layer in oracle.layers:
            layer.self_attn.pos_bias_u.normal_(0, 0.2)
            layer.self_attn.pos_bias_v.normal_(0, 0.2)
            layer.conv.batch_norm.running_mean.normal_(0, 0.2)
            layer.conv.batch_norm.running_var.uniform_(0.5, 1.5)

    B, Tm = 2, 32
    feats = torch.randn(B, cfg.encoder.feat_in, Tm)
    with torch.no_grad():
        want = oracle(feats).numpy()

    lang_keys = ["hi", "bn", "mr", "te"]
    sd = make_fake_nemo_sd(cfg, lang_keys, rng)
    sd.update(oracle.nemo_state_dict())
    variables = convert_nemo_state_dict(
        sd,
        n_layers=cfg.encoder.n_layers,
        sampling_num=cfg.encoder.sampling_num,
        subsampled_feat=subsampled_feat_dim(cfg.encoder),
        conv_channels=cfg.encoder.conv_channels,
        language_keys=lang_keys,
    )
    model, _ = init_model(cfg, jax.random.PRNGKey(0))
    got, enc_lens = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(feats.numpy()), jnp.full((B,), Tm, jnp.int32), False,
        method="encode",
    )
    assert np.asarray(enc_lens).tolist() == [8, 8]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


@pytest.mark.slow
def test_eval_pretrained_real_checkpoint_end_to_end(tmp_path):
    """Keep the real-checkpoint path warm (VERDICT r3 item 9): when
    INDIC_ASR_NEMO_PATH points at a real `.nemo` artifact, run the full
    scripts/eval_pretrained.py chain — restore (convert + SPM tokenizer
    load) -> transcribe -> WER records — so the day artifacts become
    reachable, the 0.5-abs WER gate (BASELINE.md) is one command with
    zero bit-rot. Skips otherwise (HF + IndicSUPERB unreachable offline).
    Reference: cl_baseline.py:122 from_pretrained ->
    utils.py:120-174 compute_wer/run_eval.

    Audio: INDIC_ASR_MANIFEST_DIR (real IndicSUPERB manifests) when set,
    else synthetic wavs — the chain still exercises restore + tokenize +
    decode end to end, just with meaningless WER values.
    """
    import math
    import sys as _sys

    nemo = os.environ.get("INDIC_ASR_NEMO_PATH")
    if not nemo or not os.path.exists(nemo):
        pytest.skip("INDIC_ASR_NEMO_PATH not set: no real .nemo offline")

    scripts = os.path.join(os.path.dirname(__file__), "..", "scripts")
    _sys.path.insert(0, scripts)
    import eval_pretrained

    mdir = os.environ.get("INDIC_ASR_MANIFEST_DIR")
    lang = os.environ.get("INDIC_ASR_NEMO_LANG", "hindi")
    if not mdir:
        from indic_cl_asr_tpu.data.manifest import write_manifest
        from .synth import make_wav_dataset

        entries = make_wav_dataset(
            str(tmp_path / "wav"), [lang], n_per_lang=4,
            min_dur=1.0, max_dur=2.0,
        )[lang]
        mdir = str(tmp_path / "manifests")
        os.makedirs(mdir)
        for split in ("train", "val", "noisy_val", "test", "noisy_test"):
            write_manifest(
                os.path.join(mdir, f"{lang}_{split}.jsonl"), entries
            )

    results = eval_pretrained.main([
        "--nemo", nemo,
        "--dataset.manifest_dir", mdir,
        "--languages", lang,
        "--split", "test",
        "--batch_size", "2",
        "--spm_out_dir", str(tmp_path / "spm"),
    ])
    assert {r["decoder"] for r in results} == {"rnnt", "ctc"}
    for r in results:
        assert math.isfinite(r["wer"]) and 0.0 <= r["wer"]
    # with real manifests, enforce the 0.5-abs gate against the published
    # reference WER (export INDIC_ASR_EXPECTED_WER=<ref value>)
    expected = os.environ.get("INDIC_ASR_EXPECTED_WER")
    if expected and os.environ.get("INDIC_ASR_MANIFEST_DIR"):
        rnnt = [r for r in results if r["decoder"] == "rnnt"][0]
        assert abs(rnnt["wer"] - float(expected)) <= 0.5
