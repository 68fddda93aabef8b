"""Fast (hardware-RNG) dropout keys: utils/rng.py.

The switch replaces threefry mask generation with `rbg` keys (XLA
RngBitGenerator) for the encoder and joint dropout — ~11 ms/step of pure
RNG at flagship shapes (utils/rng.py docstring has the v5e measurement).
These tests pin the contract: determinism per seed, correct Bernoulli
rate, and that the full train step runs and learns with the flag either
way (reference dropout sites: NeMo modules/rnnt.py:1403-1561 joint,
conformer_modules.py FFN/attention dropouts)."""

import jax
import jax.numpy as jnp
import numpy as np

from indic_cl_asr_tpu.train.step import StepConfig, hybrid_forward_loss
from indic_cl_asr_tpu.utils.rng import fast_dropout_key

from .test_train_step import make_batch, make_setup


def test_fast_key_deterministic_and_distinct():
    k1 = fast_dropout_key(jax.random.PRNGKey(7))
    k1b = fast_dropout_key(jax.random.PRNGKey(7))
    k2 = fast_dropout_key(jax.random.PRNGKey(8))
    d1, d1b, d2 = (jax.random.key_data(k) for k in (k1, k1b, k2))
    assert jnp.array_equal(d1, d1b)
    assert not jnp.array_equal(d1, d2)


def test_fast_key_bernoulli_rate():
    k = fast_dropout_key(jax.random.PRNGKey(0))
    keep = jax.random.bernoulli(k, 0.8, (200_000,))
    assert abs(float(keep.mean()) - 0.8) < 5e-3
    # split/fold_in stay in the rbg impl and give fresh streams
    ka, kb = jax.random.split(k)
    ma = jax.random.bernoulli(ka, 0.5, (1000,))
    mb = jax.random.bernoulli(kb, 0.5, (1000,))
    assert not jnp.array_equal(ma, mb)


def test_forward_loss_deterministic_given_seed(rng):
    cfg, model, state, _ = make_setup()
    batch = make_batch(cfg, rng)
    step_cfg = StepConfig(
        frontend=__import__(
            "indic_cl_asr_tpu.audio.features", fromlist=["FrontendConfig"]
        ).FrontendConfig(n_mels=cfg.encoder.feat_in),
        rnnt_chunk_size=8,
        fast_dropout_rng=True,
    )

    def run(seed):
        loss, _ = hybrid_forward_loss(
            model, cfg, step_cfg, state.params, state.batch_stats,
            batch["audio"], batch["audio_len"], batch["tokens"],
            batch["token_len"], batch["lang_ids"],
            jax.random.PRNGKey(seed), train=True,
        )
        return float(loss)

    assert run(3) == run(3)
    assert run(3) != run(4)  # dropout stream actually differs


def test_train_step_learns_with_fast_rng(rng):
    # make_setup builds the default StepConfig (fast_dropout_rng=True);
    # assert the jitted step still decreases the loss
    cfg, model, state, step = make_setup()
    batch = make_batch(cfg, rng)
    jstep = jax.jit(step)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(8):
        key, sub = jax.random.split(key)
        state, aux = jstep(state, batch, sub)
        losses.append(float(aux["train_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_flag_off_matches_legacy_threefry(rng):
    """fast_dropout_rng=False must reproduce the pre-flag numbers: the
    legacy path is the fallback if a libtpu ever mishandles
    RngBitGenerator, so it has to stay live."""
    cfg, model, state, _ = make_setup()
    batch = make_batch(cfg, rng)
    from indic_cl_asr_tpu.audio.features import FrontendConfig

    def run(fast):
        step_cfg = StepConfig(
            frontend=FrontendConfig(n_mels=cfg.encoder.feat_in),
            rnnt_chunk_size=8,
            fast_dropout_rng=fast,
        )
        loss, _ = hybrid_forward_loss(
            model, cfg, step_cfg, state.params, state.batch_stats,
            batch["audio"], batch["audio_len"], batch["tokens"],
            batch["token_len"], batch["lang_ids"],
            jax.random.PRNGKey(11), train=True,
        )
        return float(loss)

    a, b = run(False), run(False)
    assert a == b  # legacy path deterministic
    assert np.isfinite(run(True))


def test_dropout_keep_mask_rate_and_determinism():
    from indic_cl_asr_tpu.utils.rng import dropout_keep_mask

    k = fast_dropout_key(jax.random.PRNGKey(3))
    m1 = dropout_keep_mask(k, 0.2, (200_000,))
    m2 = dropout_keep_mask(k, 0.2, (200_000,))
    assert m1.dtype == jnp.bool_
    assert jnp.array_equal(m1, m2)
    # keep prob quantized to round(0.8*256)/256 = 205/256
    assert abs(float(m1.mean()) - 205 / 256) < 5e-3
    m3 = dropout_keep_mask(fast_dropout_key(jax.random.PRNGKey(4)), 0.2,
                           (200_000,))
    assert not jnp.array_equal(m1, m3)
    # saturating threshold keeps everything
    tiny = dropout_keep_mask(k, 1e-4, (64,))
    assert bool(tiny.all())


def test_fast_dropout_module_matches_nn_dropout_contract():
    import flax.linen as nn

    from indic_cl_asr_tpu.models.common import FastDropout

    x = jnp.ones((4, 1000))
    mod = FastDropout(0.5)
    y_det = mod.apply({}, x, True)
    assert jnp.array_equal(y_det, x)
    y = mod.apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})
    kept = y != 0.0
    # scaled by 1/keep_prob where kept
    assert np.allclose(np.asarray(y[kept]), 2.0)
    assert abs(float(kept.mean()) - 0.5) < 3e-2
    # rate 0 is the identity even in train mode
    z = FastDropout(0.0).apply({}, x, False)
    assert jnp.array_equal(z, x)
