"""Streaming encoder parity: chunked windowed recomputation must equal the
offline encoder when the window covers the receptive field (causal-conv +
left-limited-attention config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indic_cl_asr_tpu.models.conformer import ConformerConfig
from indic_cl_asr_tpu.models.hybrid import init_model, tiny_config
from indic_cl_asr_tpu.models.streaming import (
    StreamingConfig,
    StreamingEncoder,
    receptive_field_enc,
    stream_full_utterance,
)


@pytest.fixture(scope="module")
def causal_setup():
    enc = ConformerConfig(
        feat_in=32, n_layers=2, d_model=64, n_heads=4,
        ff_expansion_factor=2, conv_kernel_size=7, subsampling_factor=4,
        dropout=0.0, dropout_att=0.0, dropout_pre_encoder=0.0,
        att_context_size=(8, 0), causal_conv=True,
    )
    cfg = tiny_config(encoder=enc)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    return cfg, model, variables


def test_receptive_field_math(causal_setup):
    cfg, _, _ = causal_setup
    assert receptive_field_enc(cfg.encoder) == 2 * (8 + 6)


def test_streaming_matches_offline(causal_setup, rng):
    cfg, model, variables = causal_setup
    B, T = 2, 300
    mel = jnp.asarray(
        rng.standard_normal((B, cfg.encoder.feat_in, T)), jnp.float32
    )
    offline, _ = model.apply(
        variables, mel, jnp.full((B,), T, jnp.int32), False, method="encode"
    )
    offline = np.asarray(offline)

    se = StreamingEncoder(
        model, cfg, StreamingConfig(chunk_mel=32, window_mel=256)
    )
    streamed = stream_full_utterance(se, variables, mel)

    n = streamed.shape[1]
    assert n == (T - 1) // 4 + 1 - ((T - 1) // 4 + 1 - offline.shape[1])  # sanity
    np.testing.assert_allclose(
        streamed, offline[:, :n], atol=2e-4, rtol=1e-3
    )


def test_streaming_emission_schedule(causal_setup, rng):
    """Frames must be emitted incrementally (not all at flush)."""
    cfg, model, variables = causal_setup
    B, T = 1, 192
    mel = jnp.asarray(
        rng.standard_normal((B, cfg.encoder.feat_in, T)), jnp.float32
    )
    se = StreamingEncoder(
        model, cfg, StreamingConfig(chunk_mel=32, window_mel=128)
    )
    state = se.init(B)
    emitted_per_step = []
    for c0 in range(0, T, 32):
        _, _, n_new, state = se.step(
            variables, state, mel[:, :, c0 : c0 + 32]
        )
        emitted_per_step.append(n_new)
    _, _, n_final, state = se.flush(variables, state)
    assert sum(emitted_per_step) > 0
    assert all(n >= 0 for n in emitted_per_step)
    # ~8 frames per 32-mel chunk; flush emits only the halo tail
    assert n_final <= 2
    assert sum(emitted_per_step) + n_final == (T - 1) // 4 + 1


# ---------------------------------------------------------------------------
# cache-aware streaming (per-layer attention/conv caches, O(chunk)/step)
# ---------------------------------------------------------------------------

from indic_cl_asr_tpu.models.streaming import (  # noqa: E402
    CacheAwareStreamer,
    stream_full_utterance_cached,
)


def _enc_vars(variables):
    return {
        "params": variables["params"]["encoder"],
        "batch_stats": variables["batch_stats"]["encoder"],
    }


def test_cache_aware_matches_offline(causal_setup, rng):
    cfg, model, variables = causal_setup
    B, T = 2, 192
    mel = jnp.asarray(
        rng.standard_normal((B, cfg.encoder.feat_in, T)), jnp.float32
    )
    offline, _ = model.apply(
        variables, mel, jnp.full((B,), T, jnp.int32), False, method="encode"
    )
    streamer = CacheAwareStreamer(cfg, chunk_mel=32)
    streamed = stream_full_utterance_cached(streamer, _enc_vars(variables), mel)
    assert streamed.shape == (B, T // 4, cfg.encoder.d_model)
    np.testing.assert_allclose(
        streamed, np.asarray(offline)[:, : T // 4], atol=2e-4, rtol=1e-3
    )


def test_cache_aware_matches_offline_scan_layout(rng):
    """Same parity through the scanned (stack/layers) param layout."""
    import dataclasses

    enc = ConformerConfig(
        feat_in=32, n_layers=3, d_model=64, n_heads=4,
        ff_expansion_factor=2, conv_kernel_size=7, subsampling_factor=4,
        dropout=0.0, dropout_att=0.0, dropout_pre_encoder=0.0,
        att_context_size=(8, 0), causal_conv=True, scan_layers=True,
    )
    cfg = tiny_config(encoder=enc)
    model, variables = init_model(cfg, jax.random.PRNGKey(1))
    B, T = 1, 128
    mel = jnp.asarray(
        rng.standard_normal((B, enc.feat_in, T)), jnp.float32
    )
    offline, _ = model.apply(
        variables, mel, jnp.full((B,), T, jnp.int32), False, method="encode"
    )
    streamer = CacheAwareStreamer(cfg, chunk_mel=16)
    streamed = stream_full_utterance_cached(streamer, _enc_vars(variables), mel)
    np.testing.assert_allclose(
        streamed, np.asarray(offline)[:, : T // 4], atol=2e-4, rtol=1e-3
    )


def test_cache_aware_chunk_size_invariance(causal_setup, rng):
    """Different chunk sizes must produce identical streams."""
    cfg, model, variables = causal_setup
    B, T = 1, 128
    mel = jnp.asarray(
        rng.standard_normal((B, cfg.encoder.feat_in, T)), jnp.float32
    )
    ev = _enc_vars(variables)
    a = stream_full_utterance_cached(CacheAwareStreamer(cfg, 16), ev, mel)
    b = stream_full_utterance_cached(CacheAwareStreamer(cfg, 64), ev, mel)
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)


def test_cache_aware_rejects_noncausal():
    enc = ConformerConfig(
        feat_in=32, n_layers=2, d_model=64, n_heads=4,
        att_context_size=(-1, -1), causal_conv=False,
    )
    with pytest.raises(AssertionError):
        CacheAwareStreamer(tiny_config(encoder=enc), chunk_mel=32)


def test_streaming_asr_matches_offline_greedy(causal_setup, rng):
    """End-to-end: chunked StreamingASR emits exactly the offline greedy
    tokens (causal encoder + decoder-state continuation)."""
    from indic_cl_asr_tpu.models.streaming import StreamingASR
    from indic_cl_asr_tpu.ops.decoding import rnnt_greedy_decode

    cfg, model, variables = causal_setup
    B, T = 2, 128
    mel = jnp.asarray(
        rng.standard_normal((B, cfg.encoder.feat_in, T)) * 2.0, jnp.float32
    )
    lang = jnp.zeros((B,), jnp.int32)

    # offline: encode + greedy
    f, enc_lens = model.apply(
        variables, mel, jnp.full((B,), T, jnp.int32), False, method="encode"
    )
    f_proj = model.apply(variables, f, method="joint_project_enc")

    def pred_step(last_label, state):
        return model.apply(variables, last_label, state, method="pred_step")

    def joint_step(f_t, g_t, li):
        return model.apply(variables, f_t, g_t, li, method="joint_step")

    want_ids, want_lens = rnnt_greedy_decode(
        f_proj[:, : T // 4], jnp.full((B,), T // 4, jnp.int32), lang,
        pred_step, joint_step, None,
        blank=cfg.blank_local, max_symbols=4, max_out=64,
    )

    asr = StreamingASR(
        model, cfg, variables, chunk_mel=32, max_symbols=4, max_out=64
    )
    state = asr.init(B)
    for c0 in range(0, T, 32):
        (ids, lens), state = asr.step(state, mel[:, :, c0:c0 + 32], lang)

    np.testing.assert_array_equal(np.asarray(lens), np.asarray(want_lens))
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_ids))
    # tokens must appear incrementally usable at every step (monotone lens)


def test_streaming_asr_partial_final_chunk(causal_setup, rng):
    """ADVICE r2: a zero-padded final partial chunk must not be decoded
    as real audio — pass valid_mel and match the offline greedy decode of
    the true-length audio exactly."""
    from indic_cl_asr_tpu.models.streaming import StreamingASR
    from indic_cl_asr_tpu.ops.decoding import rnnt_greedy_decode

    cfg, model, variables = causal_setup
    B, T_real, CH = 2, 112, 32  # last chunk holds 16 real mel frames
    T_pad = 128
    mel = jnp.zeros((B, cfg.encoder.feat_in, T_pad), jnp.float32)
    mel = mel.at[:, :, :T_real].set(jnp.asarray(
        rng.standard_normal((B, cfg.encoder.feat_in, T_real)) * 2.0,
        jnp.float32,
    ))
    lang = jnp.zeros((B,), jnp.int32)

    f, _ = model.apply(
        variables, mel[:, :, :T_real],
        jnp.full((B,), T_real, jnp.int32), False, method="encode",
    )
    f_proj = model.apply(variables, f, method="joint_project_enc")

    def pred_step(last_label, state):
        return model.apply(variables, last_label, state, method="pred_step")

    def joint_step(f_t, g_t, li):
        return model.apply(variables, f_t, g_t, li, method="joint_step")

    n_frames = T_real // 4
    want_ids, want_lens = rnnt_greedy_decode(
        f_proj[:, :n_frames], jnp.full((B,), n_frames, jnp.int32), lang,
        pred_step, joint_step, None,
        blank=cfg.blank_local, max_symbols=4, max_out=64,
    )

    asr = StreamingASR(
        model, cfg, variables, chunk_mel=CH, max_symbols=4, max_out=64
    )
    state = asr.init(B)
    for c0 in range(0, T_pad, CH):
        valid = jnp.full((B,), min(CH, max(0, T_real - c0)), jnp.int32)
        (ids, lens), state = asr.step(
            state, mel[:, :, c0:c0 + CH], lang, valid_mel=valid
        )

    np.testing.assert_array_equal(np.asarray(lens), np.asarray(want_lens))
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_ids))
