"""Fused/chunked RNNT loss must equal the materialized path exactly
(values AND gradients) — it is a memory optimization, not an approximation."""

import jax
import jax.numpy as jnp
import numpy as np

from indic_cl_asr_tpu.ops.rnnt_loss import rnnt_loss
from indic_cl_asr_tpu.ops.rnnt_loss_fused import rnnt_loss_fused


def setup_case(rng, B=2, T=11, U=4, H=8, V1=6):
    f_proj = rng.standard_normal((B, T, H)).astype(np.float32)
    g_proj = rng.standard_normal((B, U + 1, H)).astype(np.float32)
    head_w = rng.standard_normal((B, H, V1)).astype(np.float32) * 0.3
    head_b = rng.standard_normal((B, V1)).astype(np.float32) * 0.1
    labels = rng.integers(0, V1 - 1, (B, U)).astype(np.int32)
    t_lens = np.array([T, T - 4], np.int32)
    u_lens = np.array([U, U - 2], np.int32)
    return f_proj, g_proj, head_w, head_b, labels, t_lens, u_lens


def materialized(f_proj, g_proj, head_w, head_b, labels, t_lens, u_lens, blank):
    inp = jax.nn.relu(f_proj[:, :, None, :] + g_proj[:, None, :, :])
    logits = (
        jnp.einsum("btuh,bhv->btuv", inp, head_w) + head_b[:, None, None, :]
    )
    return rnnt_loss(
        logits, labels, t_lens, u_lens, blank, reduction="mean_batch"
    )


def test_fused_equals_materialized_values_and_grads(rng):
    case = setup_case(rng)
    f_proj, g_proj, head_w, head_b, labels, t_lens, u_lens = map(
        jnp.asarray, case
    )
    blank = head_w.shape[-1] - 1

    def loss_mat(f, g, w, b):
        return materialized(f, g, w, b, labels, t_lens, u_lens, blank)

    def loss_fused(f, g, w, b):
        return rnnt_loss_fused(
            f, g, w, b, labels, t_lens, u_lens,
            blank=blank, chunk_size=4,
        )

    v_mat, g_mat = jax.value_and_grad(loss_mat, argnums=(0, 1, 2, 3))(
        f_proj, g_proj, head_w, head_b
    )
    v_fused, g_fused = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3))(
        f_proj, g_proj, head_w, head_b
    )
    np.testing.assert_allclose(float(v_mat), float(v_fused), rtol=1e-6)
    for a, b in zip(g_mat, g_fused):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_fused_chunk_size_invariance(rng):
    case = setup_case(rng, T=13)
    f_proj, g_proj, head_w, head_b, labels, t_lens, u_lens = map(
        jnp.asarray, case
    )
    t_lens = jnp.array([13, 9])
    blank = head_w.shape[-1] - 1
    vals = [
        float(
            rnnt_loss_fused(
                f_proj, g_proj, head_w, head_b, labels, t_lens, u_lens,
                blank=blank, chunk_size=cs,
            )
        )
        for cs in (1, 3, 13, 64)
    ]
    np.testing.assert_allclose(vals, vals[0], rtol=1e-6)


def test_fused_nonlast_blank_fallback(rng):
    """blank != last index takes the unsplit head path; values and grads
    must still match the materialized loss (the split fast path is only
    valid for the reference's blank-last head layout)."""
    case = setup_case(rng)
    f_proj, g_proj, head_w, head_b, labels, t_lens, u_lens = map(
        jnp.asarray, case
    )
    blank = 0
    labels = jnp.clip(labels + 1, 1, head_w.shape[-1] - 1)

    def loss_mat(f, g, w, b):
        return materialized(f, g, w, b, labels, t_lens, u_lens, blank)

    def loss_fused(f, g, w, b):
        return rnnt_loss_fused(
            f, g, w, b, labels, t_lens, u_lens, blank=blank, chunk_size=4
        )

    v_mat, g_mat = jax.value_and_grad(loss_mat, argnums=(0, 2))(
        f_proj, g_proj, head_w, head_b
    )
    v_fused, g_fused = jax.value_and_grad(loss_fused, argnums=(0, 2))(
        f_proj, g_proj, head_w, head_b
    )
    np.testing.assert_allclose(float(v_mat), float(v_fused), rtol=1e-6)
    for a, b in zip(g_mat, g_fused):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_fused_under_jit(rng):
    case = setup_case(rng)
    args = tuple(map(jnp.asarray, case))
    blank = args[2].shape[-1] - 1
    f = jax.jit(
        lambda *a: rnnt_loss_fused(*a, blank=blank, chunk_size=4)
    )
    assert np.isfinite(float(f(*args)))


def test_fused_dropout_deterministic_given_key(rng):
    case = setup_case(rng)
    args = tuple(map(jnp.asarray, case))
    blank = args[2].shape[-1] - 1
    k = jax.random.PRNGKey(7)
    a = float(
        rnnt_loss_fused(
            *args, blank=blank, chunk_size=4, dropout_rate=0.5, dropout_rng=k
        )
    )
    b = float(
        rnnt_loss_fused(
            *args, blank=blank, chunk_size=4, dropout_rate=0.5, dropout_rng=k
        )
    )
    c = float(
        rnnt_loss_fused(
            *args, blank=blank, chunk_size=4, dropout_rate=0.5,
            dropout_rng=jax.random.PRNGKey(8),
        )
    )
    assert a == b and a != c


def _uniform_head_case(rng, B=3, T=9, U=4, H=8, V1=6, n_langs=4, lang=2):
    """All batch rows share language `lang`, heads gathered from a
    [n_langs, H, V1] bank — the CL drivers' per-task batch shape."""
    f_proj = rng.standard_normal((B, T, H)).astype(np.float32)
    g_proj = rng.standard_normal((B, U + 1, H)).astype(np.float32)
    bank_w = rng.standard_normal((n_langs, H, V1)).astype(np.float32) * 0.3
    bank_b = rng.standard_normal((n_langs, V1)).astype(np.float32) * 0.1
    labels = rng.integers(0, V1 - 1, (B, U)).astype(np.int32)
    t_lens = np.array([T, T - 3, T - 1], np.int32)
    u_lens = np.array([U, U - 2, U - 1], np.int32)
    lang_ids = np.full((B,), lang, np.int32)
    return f_proj, g_proj, bank_w, bank_b, labels, t_lens, u_lens, lang_ids


def test_uniform_head_equals_per_sample_values_and_bank_grads(rng):
    """uniform_head=True must match the per-sample path exactly on a
    single-language batch — including the gradient scattered into the
    language bank through the jnp.take gather (the train-step wiring,
    train/step.py hybrid_forward_tensors)."""
    (f_proj, g_proj, bank_w, bank_b, labels, t_lens, u_lens,
     lang_ids) = map(jnp.asarray, _uniform_head_case(rng))
    blank = bank_w.shape[-1] - 1

    def loss(bw, bb, uniform):
        hw = jnp.take(bw, lang_ids, axis=0)
        hb = jnp.take(bb, lang_ids, axis=0)
        return rnnt_loss_fused(
            f_proj, g_proj, hw, hb, labels, t_lens, u_lens,
            blank=blank, chunk_size=4, uniform_head=uniform,
        )

    v_ps, g_ps = jax.value_and_grad(
        lambda w, b: loss(w, b, False), argnums=(0, 1)
    )(bank_w, bank_b)
    v_un, g_un = jax.value_and_grad(
        lambda w, b: loss(w, b, True), argnums=(0, 1)
    )(bank_w, bank_b)
    np.testing.assert_allclose(float(v_ps), float(v_un), rtol=1e-6)
    for a, b in zip(g_ps, g_un):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    # only the batch's language row receives gradient
    gw = np.asarray(g_un[0])
    assert np.abs(gw[2]).max() > 0
    assert np.abs(np.delete(gw, 2, axis=0)).max() == 0


def test_uniform_head_nonlast_blank_fallback(rng):
    (f_proj, g_proj, bank_w, bank_b, labels, t_lens, u_lens,
     lang_ids) = map(jnp.asarray, _uniform_head_case(rng))
    blank = 0  # not last: exercises the general (non-split) joint dot
    labels = jnp.where(labels == blank, blank + 1, labels)
    hw = jnp.take(bank_w, lang_ids, axis=0)
    hb = jnp.take(bank_b, lang_ids, axis=0)

    def loss(uniform):
        return rnnt_loss_fused(
            f_proj, g_proj, hw, hb, labels, t_lens, u_lens,
            blank=blank, chunk_size=4, uniform_head=uniform,
        )

    np.testing.assert_allclose(
        float(loss(False)), float(loss(True)), rtol=1e-6
    )


def test_uniform_head_dropout_value_and_grads(rng):
    """With dropout the two paths share the per-chunk key stream, so they
    must still agree exactly (the mask draw does not depend on the head)."""
    (f_proj, g_proj, bank_w, bank_b, labels, t_lens, u_lens,
     lang_ids) = map(jnp.asarray, _uniform_head_case(rng))
    blank = bank_w.shape[-1] - 1
    hw = jnp.take(bank_w, lang_ids, axis=0)
    hb = jnp.take(bank_b, lang_ids, axis=0)
    k = jax.random.PRNGKey(3)

    def loss(f, uniform):
        return rnnt_loss_fused(
            f, g_proj, hw, hb, labels, t_lens, u_lens,
            blank=blank, chunk_size=4, dropout_rate=0.4, dropout_rng=k,
            uniform_head=uniform,
        )

    v_ps, g_ps = jax.value_and_grad(lambda f: loss(f, False))(f_proj)
    v_un, g_un = jax.value_and_grad(lambda f: loss(f, True))(f_proj)
    np.testing.assert_allclose(float(v_ps), float(v_un), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_ps), np.asarray(g_un), rtol=1e-4, atol=1e-6
    )


def test_fused_remat_mode_invariance(rng):
    """`remat` is a scheduling knob (what the backward recomputes vs
    stores); values AND gradients must be identical across modes, with
    and without dropout (the saved mask keeps the stream fixed)."""
    case = setup_case(rng, T=13)
    f_proj, g_proj, head_w, head_b, labels, t_lens, u_lens = map(
        jnp.asarray, case
    )
    blank = head_w.shape[-1] - 1
    k = jax.random.PRNGKey(7)

    def vg(remat, dropout):
        def loss(f, g, w, b):
            return rnnt_loss_fused(
                f, g, w, b, labels, t_lens, u_lens,
                blank=blank, chunk_size=4, remat=remat,
                dropout_rate=0.3 if dropout else 0.0,
                dropout_rng=k if dropout else None,
            )
        return jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            f_proj, g_proj, head_w, head_b
        )

    for dropout in (False, True):
        v0, g0 = vg("full", dropout)
        for mode in ("save_logits", "none"):
            v, g = vg(mode, dropout)
            np.testing.assert_allclose(float(v), float(v0), rtol=1e-6)
            for a, b in zip(g, g0):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
                )
