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
    from indic_cl_asr_tpu.ops.decode_fused_pallas import MAX_B, MAX_T

    (cfg, model, variables, f_proj, lens, lang_ids, _, _) = _setup()
    w = extract_decode_weights(variables, 0)
    too_long = jnp.zeros((2, MAX_T + 128, cfg.joint_hidden), jnp.float32)
    with pytest.raises(ValueError):
        rnnt_greedy_decode_fused(
            too_long, lens[:2], w, blank=cfg.blank_local, interpret=True
        )
    too_wide = jnp.zeros((MAX_B + 1, 12, cfg.joint_hidden), jnp.float32)
    with pytest.raises(ValueError):
        rnnt_greedy_decode_fused(
            too_wide, jnp.ones((MAX_B + 1,), jnp.int32), w,
            blank=cfg.blank_local, interpret=True,
        )


def test_fused_vmem_budget_is_combined():
    """The VMEM guard must be a COMBINED (B, chunk, H) budget — at
    flagship H=640 bf16, B=64 x T_CHUNK both individually legal shapes
    must still pass (the streamed window replaced the whole-T residency),
    while an H large enough to blow the weight residency is rejected."""
    from indic_cl_asr_tpu.ops.decode_fused_pallas import (
        VMEM_BUDGET_BYTES,
        decode_vmem_bytes,
        fits_fused_decode,
    )

    # flagship eval point: B=64, long T, H=640 bf16 now fits (streamed)
    assert fits_fused_decode(64, 4096, 640, 257, 256, 2)
    # the round-3 failure case would NOT have fit un-streamed: whole-T
    # f_proj alone was B*T*H*2 = 40 MiB + weights
    assert 64 * 512 * 640 * 2 > 0.4 * VMEM_BUDGET_BYTES
    # monotone in chunk occupancy, insensitive to T past one chunk
    assert decode_vmem_bytes(64, 4096, 640, 257) == decode_vmem_bytes(
        64, 128, 640, 257
    )
    # absurd H: weights alone exceed the budget
    assert not fits_fused_decode(8, 128, 4096, 4097, 256, 4)


def test_fused_long_T_multi_chunk_parity():
    """T spanning several T_CHUNK grid blocks (incl. a partial final
    block) decodes identically to the XLA reference — the decode state
    must survive across grid steps (VERDICT r3 item 6; the reference
    supports 25 s utterances ~625 frames, rnnt_models.py:926-927)."""
    from indic_cl_asr_tpu.ops.decode_fused_pallas import T_CHUNK

    T = 2 * T_CHUNK + 44  # 3 grid steps, last one partial
    (cfg, model, variables, f_proj, lens, lang_ids,
     pred_step, joint_step) = _setup(seed=5, B=2, T=T, scale=1.5)
    ids_ref, lens_ref = rnnt_greedy_decode(
        f_proj, lens, lang_ids, pred_step, joint_step, None,
        blank=cfg.blank_local, max_symbols=2, max_out=64,
    )
    w = extract_decode_weights(variables, 0)
    ids_f, lens_f = rnnt_greedy_decode_fused(
        f_proj, lens, w, blank=cfg.blank_local, max_symbols=2,
        max_out=64, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(lens_f), np.asarray(lens_ref))
    np.testing.assert_array_equal(np.asarray(ids_f), np.asarray(ids_ref))


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
