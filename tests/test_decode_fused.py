"""Parity tests: fused single-kernel greedy decode (interpret mode) vs the
XLA rnnt_greedy_decode reference (ops/decoding.py), which itself has
python-oracle parity tests (test_decoding.py)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indic_cl_asr_tpu.models.hybrid import init_model, tiny_config
from indic_cl_asr_tpu.ops.decode_fused_pallas import (
    extract_decode_weights,
    rnnt_greedy_decode_fused,
)
from indic_cl_asr_tpu.ops.decoding import rnnt_greedy_decode


def _setup(seed=0, lang=0, B=4, T=12, scale=1.0):
    cfg = tiny_config()
    model, variables = init_model(cfg, jax.random.PRNGKey(seed))
    H = cfg.joint_hidden
    rng = np.random.default_rng(seed)
    f_proj = jnp.asarray(scale * rng.standard_normal((B, T, H)), jnp.float32)
    lens = jnp.asarray(rng.integers(1, T + 1, (B,)), jnp.int32)
    lang_ids = jnp.full((B,), lang, jnp.int32)

    def pred_step(last_label, state):
        return model.apply(variables, last_label, state, method="pred_step")

    def joint_step(f_t, g_t, li):
        return model.apply(variables, f_t, g_t, li, method="joint_step")

    return cfg, model, variables, f_proj, lens, lang_ids, pred_step, joint_step


@pytest.mark.parametrize("seed,lang,scale", [(0, 0, 1.0), (1, 2, 3.0),
                                             (2, 1, 0.3)])
def test_fused_matches_xla_greedy(seed, lang, scale):
    (cfg, model, variables, f_proj, lens, lang_ids,
     pred_step, joint_step) = _setup(seed=seed, lang=lang, scale=scale)
    ids_ref, lens_ref = rnnt_greedy_decode(
        f_proj, lens, lang_ids, pred_step, joint_step, None,
        blank=cfg.blank_local, max_symbols=4, max_out=16,
    )
    w = extract_decode_weights(variables, lang)
    ids_f, lens_f = rnnt_greedy_decode_fused(
        f_proj, lens, w, blank=cfg.blank_local, max_symbols=4,
        max_out=16, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(lens_f), np.asarray(lens_ref))
    np.testing.assert_array_equal(np.asarray(ids_f), np.asarray(ids_ref))


def test_fused_max_out_cap_and_budget():
    # tiny max_out/max_symbols force the cap paths
    (cfg, model, variables, f_proj, lens, lang_ids,
     pred_step, joint_step) = _setup(seed=3, scale=5.0, T=20)
    ids_ref, lens_ref = rnnt_greedy_decode(
        f_proj, lens, lang_ids, pred_step, joint_step, None,
        blank=cfg.blank_local, max_symbols=2, max_out=4,
    )
    w = extract_decode_weights(variables, 0)
    ids_f, lens_f = rnnt_greedy_decode_fused(
        f_proj, lens, w, blank=cfg.blank_local, max_symbols=2,
        max_out=4, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(lens_f), np.asarray(lens_ref))
    np.testing.assert_array_equal(np.asarray(ids_f), np.asarray(ids_ref))


def test_fused_zero_len_rows():
    (cfg, model, variables, f_proj, lens, lang_ids,
     pred_step, joint_step) = _setup(seed=4)
    lens = lens.at[0].set(0)
    ids_ref, lens_ref = rnnt_greedy_decode(
        f_proj, lens, lang_ids, pred_step, joint_step, None,
        blank=cfg.blank_local,
    )
    w = extract_decode_weights(variables, 0)
    ids_f, lens_f = rnnt_greedy_decode_fused(
        f_proj, lens, w, blank=cfg.blank_local, interpret=True,
    )
    assert int(lens_f[0]) == 0
    np.testing.assert_array_equal(np.asarray(lens_f), np.asarray(lens_ref))
    np.testing.assert_array_equal(np.asarray(ids_f), np.asarray(ids_ref))


def test_fused_rejects_oversize():
    (cfg, model, variables, f_proj, lens, lang_ids, _, _) = _setup()
    w = extract_decode_weights(variables, 0)
    big = jnp.zeros((2, 1024, cfg.joint_hidden), jnp.float32)
    with pytest.raises(ValueError):
        rnnt_greedy_decode_fused(
            big, lens[:2], w, blank=cfg.blank_local, interpret=True
        )


@pytest.mark.medium
def test_transcriber_fused_matches_labelsync(tmp_path):
    """Transcriber(greedy_impl='fused') returns the same hypotheses as the
    default labelsync Transcriber (uniform-language batches; the fused
    path's lax.cond takes the kernel branch)."""
    from indic_cl_asr_tpu.audio.features import FrontendConfig
    from indic_cl_asr_tpu.data.pipeline import BucketSpec
    from indic_cl_asr_tpu.train.eval import Transcriber

    from .synth import make_tokenizer, make_wav_dataset

    langs = ["hindi", "tamil"]
    data = make_wav_dataset(str(tmp_path), langs, n_per_lang=4)
    tok = make_tokenizer(langs)
    per = max(t.vocab_size for t in tok.tokenizers_dict.values())
    cfg = tiny_config(vocab_size_total=per * len(langs), n_langs=len(langs))
    model, variables = init_model(cfg, jax.random.PRNGKey(0))

    def make_tr(impl):
        return Transcriber(
            model=model, model_cfg=cfg, tokenizer=tok, languages=langs,
            frontend=FrontendConfig(n_mels=cfg.encoder.feat_in),
            batch_size=4,
            bucket_spec=BucketSpec(
                boundaries_sec=(1.0, 2.0), max_tokens=(48, 64)
            ),
            max_symbols=3, max_out=48, greedy_impl=impl,
        )

    for entries in (data["hindi"], data["tamil"]):
        hyp_ref = make_tr("labelsync").transcribe(variables, entries, "rnnt")
        hyp_fused = make_tr("fused").transcribe(variables, entries, "rnnt")
        assert hyp_fused == hyp_ref


def test_transcriber_auto_impl_resolves_by_backend():
    """greedy_impl='auto' (the default) resolves to 'fused' on TPU and
    'labelsync' elsewhere, at construction time."""
    from indic_cl_asr_tpu.audio.features import FrontendConfig
    from indic_cl_asr_tpu.train.eval import Transcriber

    cfg = tiny_config()
    model, _ = init_model(cfg, jax.random.PRNGKey(0))
    tr = Transcriber(
        model=model, model_cfg=cfg, tokenizer=None, languages=["hindi"],
        frontend=FrontendConfig(n_mels=cfg.encoder.feat_in),
    )
    expected = "fused" if jax.default_backend() == "tpu" else "labelsync"
    assert tr.greedy_impl == expected
