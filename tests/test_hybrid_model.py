import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from indic_cl_asr_tpu.models.hybrid import (
    HybridRNNTCTC,
    init_model,
    tiny_config,
)
from indic_cl_asr_tpu.models.rnnt import LSTM


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_config()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    return cfg, model, variables


def test_lstm_matches_torch():
    B, U, D, H = 2, 5, 8, 8
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, U, D)).astype(np.float32)

    lstm = LSTM(H)
    variables = lstm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out, (h, c) = lstm.apply(variables, jnp.asarray(x))

    tl = torch.nn.LSTM(D, H, batch_first=True)
    with torch.no_grad():
        p = variables["params"]
        tl.weight_ih_l0.copy_(torch.from_numpy(np.asarray(p["w_ih"]).T))
        tl.weight_hh_l0.copy_(torch.from_numpy(np.asarray(p["w_hh"]).T))
        tl.bias_ih_l0.copy_(torch.from_numpy(np.asarray(p["bias"])))
        tl.bias_hh_l0.zero_()
        t_out, (t_h, t_c) = tl(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), t_h[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), t_c[0].numpy(), atol=1e-5)


def test_prediction_network_sos_and_blank_zero(model_and_vars):
    cfg, model, variables = model_and_vars
    B, U = 2, 6
    tokens = jnp.zeros((B, U), jnp.int32)
    g, state = model.apply(
        variables, tokens, method="predict"
    )
    assert g.shape == (B, U + 1, cfg.pred_hidden)
    assert state[0][0].shape == (B, cfg.pred_hidden)

    # blank embedding row is exactly zero: an all-blank sequence at U=0
    # (just SOS) must equal the zero-input LSTM step
    g0, _ = model.apply(
        variables, jnp.zeros((B, 0), jnp.int32), method="predict"
    )
    assert g0.shape == (B, 1, cfg.pred_hidden)


def test_joint_shapes_and_blank_last(model_and_vars):
    cfg, model, variables = model_and_vars
    B, T, U = 2, 7, 4
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.standard_normal((B, T, cfg.encoder.d_model)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, U, cfg.pred_hidden)), jnp.float32)
    lang_ids = jnp.array([0, 3])
    out = model.apply(variables, f, g, lang_ids, method="joint_logits")
    assert out.shape == (B, T, U, cfg.vocab_per_lang + 1)
    assert out.dtype == jnp.float32


def test_joint_stacked_head_equals_per_language_routing(model_and_vars):
    """The stacked-gather head must equal routing each sample through its
    own language's linear (reference ModuleDict semantics)."""
    cfg, model, variables = model_and_vars
    B, T, U = 3, 5, 4
    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.standard_normal((B, T, cfg.encoder.d_model)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, U, cfg.pred_hidden)), jnp.float32)
    lang_ids = np.array([2, 0, 1])
    batched = model.apply(
        variables, f, g, jnp.asarray(lang_ids), method="joint_logits"
    )
    for i, lang in enumerate(lang_ids):
        single = model.apply(
            variables, f[i : i + 1], g[i : i + 1],
            jnp.array([lang]), method="joint_logits",
        )
        np.testing.assert_allclose(
            np.asarray(batched)[i], np.asarray(single)[0], atol=1e-5
        )


def test_ctc_slice_equals_aggregate_mask(model_and_vars):
    """Per-language slice-gather head == aggregate head + boolean mask
    select (reference conv_asr.py:471-484 semantics)."""
    cfg, model, variables = model_and_vars
    B, T = 2, 6
    rng = np.random.default_rng(3)
    enc = jnp.asarray(rng.standard_normal((B, T, cfg.encoder.d_model)), jnp.float32)
    lang_ids = np.array([1, 3])

    sliced = model.apply(
        variables, enc, jnp.asarray(lang_ids), method="ctc_logprobs"
    )
    aggregate = model.apply(variables, enc, None, method="ctc_logprobs")
    # rebuild per-lang log-probs from aggregate logits by slicing columns
    # (aggregate output is log_softmax over V_total+1, so recompute from
    # the model's own sliced logits path instead — compare to manual gather)
    agg_logits = np.asarray(
        model.apply(variables, enc, None, return_logits=True,
                    method="ctc_logprobs")[1]
    )
    V = cfg.vocab_per_lang
    for i, lang in enumerate(lang_ids):
        cols = list(range(lang * V, (lang + 1) * V)) + [cfg.vocab_size_total]
        manual = agg_logits[i][:, cols]
        manual = manual - np.log(np.exp(manual).sum(-1, keepdims=True))
        np.testing.assert_allclose(
            np.asarray(sliced)[i], manual, atol=1e-5
        )
    assert sliced.shape == (B, T, V + 1)
    assert aggregate.shape == (B, T, cfg.vocab_size_total + 1)


def test_full_forward_and_param_count(model_and_vars):
    cfg, model, variables = model_and_vars
    B, Tm, U = 2, 32, 5
    feats = jnp.asarray(
        np.random.default_rng(4).standard_normal((B, cfg.encoder.feat_in, Tm)),
        jnp.float32,
    )
    feat_lens = jnp.array([32, 20], jnp.int32)
    tokens = jnp.asarray(
        np.random.default_rng(5).integers(0, cfg.vocab_per_lang, (B, U)),
        jnp.int32,
    )
    joint, ctc, enc_lens = model.apply(
        variables, feats, feat_lens, tokens, jnp.array([0, 1])
    )
    assert joint.shape == (B, 8, U + 1, cfg.vocab_per_lang + 1)
    assert ctc.shape == (B, 8, cfg.vocab_per_lang + 1)
    # log-probs sum to 1
    np.testing.assert_allclose(
        np.exp(np.asarray(ctc)).sum(-1), 1.0, atol=1e-5
    )


def test_pred_step_blank_is_zero_embedding_sos(model_and_vars):
    """Decode-time blank (blank_local) must prime the prediction net with the
    zero-pinned pad row, matching training's SOS / the reference's
    `decoder.predict(None)` zero-tensor priming (ADVICE r1 high: feeding raw
    blank_local would embed another language's real token)."""
    cfg, model, variables = model_and_vars
    B = 3

    g_blank, st_blank = model.apply(
        variables, jnp.full((B,), cfg.blank_local, jnp.int32), None,
        method="pred_step",
    )
    # explicit pad row == blank_local must be identical
    g_pad, st_pad = model.apply(
        variables, jnp.full((B,), cfg.vocab_size_total, jnp.int32), None,
        method="pred_step",
    )
    np.testing.assert_allclose(np.asarray(g_blank), np.asarray(g_pad))

    # and must equal the training SOS step: predict([], add_sos=True)
    g_sos, _ = model.apply(
        variables, jnp.zeros((B, 0), jnp.int32), True, None, False,
        method="predict",
    )
    g_sos_proj = model.apply(variables, g_sos[:, 0, :],
                             method="joint_project_pred")
    np.testing.assert_allclose(
        np.asarray(g_blank), np.asarray(g_sos_proj), atol=1e-6
    )

    # a real token must NOT match the zero-input step
    g_tok, _ = model.apply(
        variables, jnp.full((B,), 1, jnp.int32), None, method="pred_step"
    )
    assert not np.allclose(np.asarray(g_tok), np.asarray(g_blank))
