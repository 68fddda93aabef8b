"""Multiblank / TDT transducer losses vs brute-force NumPy lattice oracles
(the oracles follow the reference CUDA kernels' recursions literally:
gpu_rnnt_kernel.py:411-520 multiblank, :889-1065 TDT)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indic_cl_asr_tpu.ops.rnnt_loss import rnnt_nll_from_logprobs
from indic_cl_asr_tpu.ops.rnnt_variants import multiblank_rnnt_loss, tdt_loss

NEG = -1e30


def lse(*xs):
    return np.logaddexp.reduce(np.asarray(xs))


def multiblank_oracle(lp, labels, T, U, blank, big_ds, sigma):
    """lp [Tmax, U+1, V+1] log-softmaxed; returns -loglike."""
    U1 = U + 1
    a = np.full((T, U1), NEG)
    a[0, 0] = 0.0
    for t in range(T):
        for u in range(U1):
            if t == 0 and u == 0:
                continue
            cands = []
            if t > 0:
                cands.append(a[t - 1, u] + lp[t - 1, u, blank] - sigma)
                for i, d in enumerate(big_ds):
                    if t >= d:
                        cands.append(
                            a[t - d, u] + lp[t - d, u, blank - 1 - i] - sigma
                        )
            if u > 0:
                cands.append(a[t, u - 1] + lp[t, u - 1, labels[u - 1]] - sigma)
            a[t, u] = lse(*cands) if cands else NEG
    ll = a[T - 1, U] + lp[T - 1, U, blank] - sigma
    for i, d in enumerate(big_ds):
        if T >= d:
            ll = lse(ll, a[T - d, U] + lp[T - d, U, blank - 1 - i] - sigma)
    return -ll


def tdt_oracle(lp, lpd, labels, T, U, blank, durations, sigma):
    U1 = U + 1
    a = np.full((T, U1), NEG)
    a[0, 0] = 0.0
    for n in range(1, T + U1):
        for u in range(U1):
            t = n - u
            if t < 0 or t >= T:
                continue
            if t == 0 and u == 0:
                continue
            cands = []
            for i, d in enumerate(durations):
                if d >= 1 and t >= d:
                    cands.append(
                        a[t - d, u] + lp[t - d, u, blank] - sigma
                        + lpd[t - d, u, i]
                    )
                if u > 0 and t >= d:
                    cands.append(
                        a[t - d, u - 1] + lp[t - d, u - 1, labels[u - 1]]
                        - sigma + lpd[t - d, u - 1, i]
                    )
            a[t, u] = lse(*cands) if cands else NEG
    terms = []
    for i, d in enumerate(durations):
        if d >= 1 and T >= d:
            terms.append(
                a[T - d, U] + lp[T - d, U, blank] - sigma + lpd[T - d, U, i]
            )
    return -lse(*terms)


def _rand_logprobs(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def test_multiblank_matches_oracle():
    rng = np.random.default_rng(0)
    B, Tmax, U, V1 = 3, 7, 4, 8
    blank, big_ds = V1 - 1, (2, 3)  # big blanks at indices blank-1, blank-2
    lp = _rand_logprobs(rng, (B, Tmax, U + 1, V1))
    labels = rng.integers(0, blank - len(big_ds), (B, U)).astype(np.int32)
    t_lens = np.array([7, 5, 6], np.int32)
    u_lens = np.array([4, 2, 3], np.int32)
    got = multiblank_rnnt_loss(
        jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(t_lens),
        jnp.asarray(u_lens), blank=blank, big_blank_durations=big_ds,
        sigma=0.05, reduction="none",
    )
    for b in range(B):
        want = multiblank_oracle(
            lp[b], labels[b], int(t_lens[b]), int(u_lens[b]), blank,
            big_ds, 0.05,
        )
        np.testing.assert_allclose(float(got[b]), want, rtol=1e-4, atol=1e-4)


def test_multiblank_no_bigblanks_equals_standard_rnnt():
    rng = np.random.default_rng(1)
    B, Tmax, U, V1 = 2, 6, 3, 6
    blank = V1 - 1
    lp = _rand_logprobs(rng, (B, Tmax, U + 1, V1))
    labels = rng.integers(0, blank, (B, U)).astype(np.int32)
    t_lens = np.array([6, 4], np.int32)
    u_lens = np.array([3, 2], np.int32)
    got = multiblank_rnnt_loss(
        jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(t_lens),
        jnp.asarray(u_lens), blank=blank, big_blank_durations=(),
        sigma=0.0, reduction="none",
    )
    labels_pad = np.concatenate([labels, np.zeros((B, 1), np.int32)], 1)
    lp_blank = jnp.asarray(lp[..., blank])
    lp_label = jnp.asarray(
        np.take_along_axis(lp, labels_pad[:, None, :, None], axis=3)[..., 0]
    )
    want = rnnt_nll_from_logprobs(
        lp_blank, lp_label, jnp.asarray(t_lens), jnp.asarray(u_lens)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_tdt_matches_oracle():
    rng = np.random.default_rng(2)
    B, Tmax, U, V1 = 3, 8, 3, 7
    blank = V1 - 1
    durations = (0, 1, 2, 4)
    lp = _rand_logprobs(rng, (B, Tmax, U + 1, V1))
    lpd = _rand_logprobs(rng, (B, Tmax, U + 1, len(durations)))
    labels = rng.integers(0, blank, (B, U)).astype(np.int32)
    t_lens = np.array([8, 5, 7], np.int32)
    u_lens = np.array([3, 2, 1], np.int32)
    got = tdt_loss(
        jnp.asarray(lp), jnp.asarray(lpd), jnp.asarray(labels),
        jnp.asarray(t_lens), jnp.asarray(u_lens), blank=blank,
        durations=durations, sigma=0.02, reduction="none",
    )
    for b in range(B):
        want = tdt_oracle(
            lp[b], lpd[b], labels[b], int(t_lens[b]), int(u_lens[b]),
            blank, durations, 0.02,
        )
        np.testing.assert_allclose(float(got[b]), want, rtol=1e-4, atol=1e-4)


def test_variants_are_differentiable_and_jittable():
    rng = np.random.default_rng(3)
    B, Tmax, U, V1 = 2, 6, 3, 6
    blank = V1 - 1
    lp = jnp.asarray(_rand_logprobs(rng, (B, Tmax, U + 1, V1)))
    lpd = jnp.asarray(_rand_logprobs(rng, (B, Tmax, U + 1, 3)))
    labels = jnp.asarray(rng.integers(0, blank - 1, (B, U)), jnp.int32)
    t_lens = jnp.array([6, 5], jnp.int32)
    u_lens = jnp.array([3, 2], jnp.int32)

    f_mb = jax.jit(
        lambda x: multiblank_rnnt_loss(
            x, labels, t_lens, u_lens, blank=blank,
            big_blank_durations=(2,), reduction="mean_batch",
        )
    )
    g = jax.grad(f_mb)(lp)
    assert np.isfinite(float(f_mb(lp))) and np.isfinite(
        np.asarray(g)
    ).all()

    f_tdt = jax.jit(
        lambda x, xd: tdt_loss(
            x, xd, labels, t_lens, u_lens, blank=blank,
            durations=(0, 1, 2), reduction="mean_batch",
        )
    )
    gt = jax.grad(f_tdt)(lp, lpd)
    assert np.isfinite(float(f_tdt(lp, lpd))) and np.isfinite(
        np.asarray(gt)
    ).all()
