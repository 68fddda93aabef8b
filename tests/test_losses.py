"""Lattice-loss parity tests: JAX implementations vs NumPy oracles, brute
force enumeration, torch CTC, and numerical gradients (the reference's test
pattern, SURVEY.md §4: rnnt_numpy oracle + small/random/grad cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from indic_cl_asr_tpu.ops import reference_numpy as ref
from indic_cl_asr_tpu.ops.ctc_loss import ctc_loss
from indic_cl_asr_tpu.ops.rnnt_loss import (
    gather_blank_and_label_logprobs,
    rnnt_loss,
    rnnt_nll_from_logprobs,
)


def random_case(rng, B=3, T=6, U=4, V=5, blank_last=True):
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    labels = rng.integers(0, V - 1, (B, U)).astype(np.int32)
    t_lens = np.array([T] + list(rng.integers(2, T + 1, B - 1)), np.int32)
    u_lens = np.array([U] + list(rng.integers(1, U + 1, B - 1)), np.int32)
    blank = V - 1
    return logits, labels, t_lens, u_lens, blank


class TestRNNTLoss:
    def test_matches_numpy_oracle_full_lengths(self, rng):
        logits, labels, _, _, blank = random_case(rng)
        B, T, U1, V = logits.shape
        t_lens = np.full((B,), T, np.int32)
        u_lens = np.full((B,), U1 - 1, np.int32)
        got = np.asarray(
            rnnt_loss(
                jnp.asarray(logits), jnp.asarray(labels),
                jnp.asarray(t_lens), jnp.asarray(u_lens),
                blank, reduction="none",
            )
        )
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
        for b in range(B):
            want, _ = ref.rnnt_forward_np(lp[b], labels[b], blank)
            np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)

    def test_matches_brute_force_tiny(self, rng):
        logits, labels, _, _, blank = random_case(rng, B=1, T=3, U=2, V=3)
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        want = ref.rnnt_loss_brute_force(lp[0], labels[0], blank)
        got = float(
            rnnt_loss(
                jnp.asarray(logits), jnp.asarray(labels),
                jnp.array([3]), jnp.array([2]), blank, reduction="none",
            )[0]
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_variable_lengths_match_sliced_oracle(self, rng):
        logits, labels, t_lens, u_lens, blank = random_case(rng, B=4)
        got = np.asarray(
            rnnt_loss(
                jnp.asarray(logits), jnp.asarray(labels),
                jnp.asarray(t_lens), jnp.asarray(u_lens),
                blank, reduction="none",
            )
        )
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        for b in range(len(t_lens)):
            Tb, Ub = int(t_lens[b]), int(u_lens[b])
            want, _ = ref.rnnt_forward_np(
                lp[b, :Tb, : Ub + 1], labels[b, :Ub], blank
            )
            np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)

    def test_gradient_matches_numpy_occupancy(self, rng):
        logits, labels, t_lens, u_lens, blank = random_case(rng, B=2, T=5, U=3, V=4)
        jl = jnp.asarray(logits)

        def loss_fn(x):
            return rnnt_loss(
                x, jnp.asarray(labels), jnp.asarray(t_lens),
                jnp.asarray(u_lens), blank, reduction="sum",
            )

        got = np.asarray(jax.grad(loss_fn)(jl))
        lp = np.asarray(jax.nn.log_softmax(jl, -1))
        for b in range(2):
            Tb, Ub = int(t_lens[b]), int(u_lens[b])
            g_lp = ref.rnnt_grad_np(lp[b, :Tb, : Ub + 1], labels[b, :Ub], blank)
            # chain through log_softmax: dL/dz = dL/dlp - softmax * sum(dL/dlp)
            p = np.exp(lp[b, :Tb, : Ub + 1])
            want = g_lp - p * g_lp.sum(-1, keepdims=True)
            np.testing.assert_allclose(
                got[b, :Tb, : Ub + 1], want, rtol=1e-4, atol=1e-5
            )
        # padding region gets zero grad
        assert np.all(got[1, int(t_lens[1]) :] == 0.0)

    def test_gradient_numerical(self, rng):
        logits, labels, t_lens, u_lens, blank = random_case(rng, B=1, T=3, U=2, V=3)
        jl = jnp.asarray(logits)

        def loss_fn(x):
            return rnnt_loss(
                x, jnp.asarray(labels), jnp.asarray(t_lens),
                jnp.asarray(u_lens), blank, reduction="sum",
            )

        ana = np.asarray(jax.grad(loss_fn)(jl))
        eps = 1e-3
        for idx in [(0, 0, 0, 0), (0, 1, 1, 2), (0, 2, 2, 1)]:
            e = np.zeros_like(logits)
            e[idx] = eps
            num = (
                float(loss_fn(jnp.asarray(logits + e)))
                - float(loss_fn(jnp.asarray(logits - e)))
            ) / (2 * eps)
            np.testing.assert_allclose(ana[idx], num, rtol=2e-2, atol=1e-4)

    def test_jit_and_reductions(self, rng):
        logits, labels, t_lens, u_lens, blank = random_case(rng)
        args = (
            jnp.asarray(logits), jnp.asarray(labels),
            jnp.asarray(t_lens), jnp.asarray(u_lens),
        )
        per = rnnt_loss(*args, blank, reduction="none")
        assert float(
            jax.jit(lambda *a: rnnt_loss(*a, blank))(*args)
        ) == pytest.approx(float(jnp.mean(per)), rel=1e-6)
        assert float(rnnt_loss(*args, blank, reduction="sum")) == pytest.approx(
            float(jnp.sum(per)), rel=1e-6
        )

    def test_gather_helper(self, rng):
        logits, labels, _, _, blank = random_case(rng, B=2, T=3, U=2, V=4)
        lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
        lpb, lpl = gather_blank_and_label_logprobs(
            lp, jnp.asarray(labels), blank
        )
        np.testing.assert_allclose(
            np.asarray(lpb), np.asarray(lp)[..., blank]
        )
        np.testing.assert_allclose(
            np.asarray(lpl)[0, 1, 0], np.asarray(lp)[0, 1, 0, labels[0, 0]]
        )


@pytest.mark.parametrize("impl", ["native", "optax"])
class TestCTCLoss:
    def test_matches_numpy_and_torch(self, rng, impl):
        B, T, U, V1 = 3, 8, 3, 6  # V1 includes blank (last)
        logits = rng.standard_normal((B, T, V1)).astype(np.float32)
        labels = rng.integers(0, V1 - 1, (B, U)).astype(np.int32)
        t_lens = np.array([8, 6, 5], np.int32)
        u_lens = np.array([3, 2, 1], np.int32)
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))

        got = np.asarray(
            ctc_loss(
                jnp.asarray(lp), jnp.asarray(t_lens), jnp.asarray(labels),
                jnp.asarray(u_lens), reduction="none", impl=impl,
            )
        )
        # numpy oracle
        for b in range(B):
            want = ref.ctc_loss_np(
                lp[b, : t_lens[b]], labels[b, : u_lens[b]].tolist(), V1 - 1
            )
            np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)
        # torch oracle (blank last)
        tl = torch.nn.CTCLoss(blank=V1 - 1, reduction="none")
        t_loss = tl(
            torch.from_numpy(lp).transpose(0, 1),
            torch.from_numpy(labels.astype(np.int64)),
            torch.from_numpy(t_lens.astype(np.int64)),
            torch.from_numpy(u_lens.astype(np.int64)),
        )
        np.testing.assert_allclose(got, t_loss.numpy(), rtol=1e-4, atol=1e-4)

    def test_mean_batch_reduction(self, rng, impl):
        B, T, U, V1 = 2, 6, 2, 5
        logits = rng.standard_normal((B, T, V1)).astype(np.float32)
        labels = rng.integers(0, V1 - 1, (B, U)).astype(np.int32)
        lens = jnp.array([T, T]), jnp.array([U, U])
        per = ctc_loss(
            jnp.asarray(logits), lens[0], jnp.asarray(labels), lens[1],
            reduction="none", impl=impl,
        )
        mb = ctc_loss(
            jnp.asarray(logits), lens[0], jnp.asarray(labels), lens[1],
            reduction="mean_batch", impl=impl,
        )
        assert float(mb) == pytest.approx(float(jnp.mean(per)), rel=1e-6)


class TestCTCNativeGradients:
    def test_native_grads_match_optax(self, rng):
        B, T, U, V1 = 3, 8, 3, 6
        logits = rng.standard_normal((B, T, V1)).astype(np.float32)
        labels = rng.integers(0, V1 - 1, (B, U)).astype(np.int32)
        t_lens = jnp.array([8, 6, 5])
        u_lens = jnp.array([3, 2, 1])

        def loss(impl):
            def f(x):
                return ctc_loss(
                    x, t_lens, jnp.asarray(labels), u_lens,
                    reduction="sum", impl=impl,
                )
            return f

        v_n, g_n = jax.value_and_grad(loss("native"))(jnp.asarray(logits))
        v_o, g_o = jax.value_and_grad(loss("optax"))(jnp.asarray(logits))
        np.testing.assert_allclose(float(v_n), float(v_o), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_n), np.asarray(g_o), atol=2e-4, rtol=1e-3
        )

    def test_native_grads_numerical(self, rng):
        B, T, U, V1 = 1, 5, 2, 4
        logits = rng.standard_normal((B, T, V1)).astype(np.float32)
        labels = rng.integers(0, V1 - 1, (B, U)).astype(np.int32)
        t_lens, u_lens = jnp.array([5]), jnp.array([2])

        def f(x):
            return ctc_loss(x, t_lens, jnp.asarray(labels), u_lens,
                            reduction="sum", impl="native")

        ana = np.asarray(jax.grad(f)(jnp.asarray(logits)))
        eps = 1e-3
        for idx in [(0, 0, 0), (0, 2, 3), (0, 4, 1)]:
            e = np.zeros_like(logits)
            e[idx] = eps
            num = (float(f(jnp.asarray(logits + e)))
                   - float(f(jnp.asarray(logits - e)))) / (2 * eps)
            np.testing.assert_allclose(ana[idx], num, rtol=3e-2, atol=1e-4)
