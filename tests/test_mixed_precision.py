"""Mixed-precision (bf16 compute) numerics guards.

Round 3 moved the big HBM/MXU paths to the compute dtype (attention
scores, joint dots fwd+bwd, slab extraction) with f32 accumulation /
softmax statistics — the AMP contract. These tests pin that the bf16
program stays numerically close to the all-f32 program: a silent f32
promotion would only show up as a perf regression, but a silent
*precision* regression (e.g. bf16 accumulation, bf16 softmax stats)
would show up here.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indic_cl_asr_tpu.audio.features import FrontendConfig
from indic_cl_asr_tpu.models.hybrid import init_model, tiny_config
from indic_cl_asr_tpu.train.step import StepConfig, hybrid_forward_loss


def _flat(tree):
    return jnp.concatenate(
        [jnp.ravel(x).astype(jnp.float32) for x in jax.tree.leaves(tree)]
    )


def _cfg(dtype):
    cfg = tiny_config()
    enc = dataclasses.replace(cfg.encoder, dtype=dtype)
    return dataclasses.replace(cfg, encoder=enc, dtype=dtype)


@pytest.mark.medium
def test_bf16_step_loss_and_grads_track_f32(rng):
    cfg32 = _cfg(jnp.float32)
    cfg16 = _cfg(jnp.bfloat16)
    # identical f32 master weights for both programs (params are stored
    # f32 in both; only compute dtype differs)
    model32, variables = init_model(cfg32, jax.random.PRNGKey(0))
    model16, _ = init_model(cfg16, jax.random.PRNGKey(0))

    B, S, U = 4, 8000, 6
    batch = dict(
        audio=jnp.asarray(0.1 * rng.standard_normal((B, S)), jnp.float32),
        audio_len=jnp.asarray([S, S, S // 2, S // 4], jnp.int32),
        tokens=jnp.asarray(
            rng.integers(1, cfg32.vocab_per_lang, (B, U)), jnp.int32
        ),
        token_len=jnp.full((B,), U, jnp.int32),
        lang_ids=jnp.asarray([0, 1, 2, 3], jnp.int32),
    )
    step_cfg = StepConfig(
        frontend=FrontendConfig(n_mels=cfg32.encoder.feat_in),
        use_spec_augment=False,
        rnnt_chunk_size=8,
    )

    def loss_grads(model, mcfg):
        def f(params):
            loss, _ = hybrid_forward_loss(
                model, mcfg, step_cfg, params, variables["batch_stats"],
                batch["audio"], batch["audio_len"], batch["tokens"],
                batch["token_len"], batch["lang_ids"],
                jax.random.PRNGKey(7), train=True,
            )
            return loss

        return jax.value_and_grad(f)(variables["params"])

    l32, g32 = jax.jit(lambda: loss_grads(model32, cfg32))()
    l16, g16 = jax.jit(lambda: loss_grads(model16, cfg16))()

    # bf16 has ~3 decimal digits; the loss is a mean over B of O(100)
    # NLLs, so 1% relative is a conservative bound for a healthy AMP
    # program and far tighter than any f32->bf16-statistics bug would be
    assert np.isfinite(float(l16))
    assert abs(float(l16) - float(l32)) <= 0.01 * abs(float(l32)), (
        float(l32), float(l16),
    )

    # gradient DIRECTION must survive: cosine similarity of the full
    # gradient vector. A dropped/mis-scaled term shows up here hard.
    v32, v16 = _flat(g32), _flat(g16)
    cos = float(
        jnp.vdot(v32, v16)
        / (jnp.linalg.norm(v32) * jnp.linalg.norm(v16) + 1e-30)
    )
    assert cos > 0.99, cos
    # and the magnitude must be in the same ballpark
    ratio = float(jnp.linalg.norm(v16) / (jnp.linalg.norm(v32) + 1e-30))
    assert 0.9 < ratio < 1.1, ratio
