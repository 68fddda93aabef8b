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
