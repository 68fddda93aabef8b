"""Fused joint Pallas kernel (interpret mode) vs the XLA chunked path:
slab values, end-to-end loss, and gradients for all four operands."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indic_cl_asr_tpu.ops.joint_fused_pallas import joint_slabs_pallas
from indic_cl_asr_tpu.ops.rnnt_loss import gather_blank_and_label_logprobs
from indic_cl_asr_tpu.ops.rnnt_loss_fused import rnnt_loss_fused


@pytest.fixture
def case(rng):
    B, T, U, H, V1 = 2, 10, 4, 8, 6
    f = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, U + 1, H)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((B, H, V1)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, V1)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, V1 - 1, (B, U)), jnp.int32)
    t_lens = jnp.array([10, 7], jnp.int32)
    u_lens = jnp.array([4, 2], jnp.int32)
    return f, g, w, b, labels, t_lens, u_lens


def xla_slabs(f, g, w, b, labels_pad, blank):
    inp = jax.nn.relu(f[:, :, None, :] + g[:, None, :, :])
    logits = jnp.einsum("btuh,bhv->btuv", inp, w) + b[:, None, None, :]
    lp = jax.nn.log_softmax(logits, axis=-1)
    return gather_blank_and_label_logprobs(lp, labels_pad[:, :-1], blank)


def test_slab_values_match_xla(case):
    f, g, w, b, labels, t_lens, u_lens = case
    B = f.shape[0]
    blank = w.shape[-1] - 1
    labels_pad = jnp.concatenate(
        [labels, jnp.zeros((B, 1), labels.dtype)], axis=1
    )
    lpb_p, lpl_p = joint_slabs_pallas(
        f, g, w, b, labels_pad, jnp.zeros((1,), jnp.int32),
        blank, 4, 0.0, True,
    )
    lpb_x, lpl_x = xla_slabs(f, g, w, b, labels_pad, blank)
    np.testing.assert_allclose(
        np.asarray(lpb_p), np.asarray(lpb_x), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(lpl_p), np.asarray(lpl_x), rtol=1e-5, atol=1e-5
    )


def test_loss_and_grads_match_xla_impl(case):
    f, g, w, b, labels, t_lens, u_lens = case
    blank = w.shape[-1] - 1

    def loss(impl):
        def fn(f_, g_, w_, b_):
            return rnnt_loss_fused(
                f_, g_, w_, b_, labels, t_lens, u_lens,
                blank=blank, chunk_size=4, impl=impl,
            )
        return fn

    v_x, g_x = jax.value_and_grad(loss("xla"), argnums=(0, 1, 2, 3))(
        f, g, w, b
    )
    v_p, g_p = jax.value_and_grad(
        loss("pallas_interpret"), argnums=(0, 1, 2, 3)
    )(f, g, w, b)
    np.testing.assert_allclose(float(v_x), float(v_p), rtol=1e-6)
    for a, bb in zip(g_x, g_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-5
        )


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu PRNG is unsupported in interpret mode (CPU)",
)
def test_dropout_deterministic_per_seed(case):
    f, g, w, b, labels, t_lens, u_lens = case
    B = f.shape[0]
    blank = w.shape[-1] - 1
    labels_pad = jnp.concatenate(
        [labels, jnp.zeros((B, 1), labels.dtype)], axis=1
    )

    def run(seed):
        return joint_slabs_pallas(
            f, g, w, b, labels_pad, jnp.array([seed], jnp.int32),
            blank, 4, 0.5, True,
        )

    a1 = np.asarray(run(7)[0])
    a2 = np.asarray(run(7)[0])
    a3 = np.asarray(run(8)[0])
    np.testing.assert_array_equal(a1, a2)
    assert not np.allclose(a1, a3)
