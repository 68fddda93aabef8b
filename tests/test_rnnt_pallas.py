"""Pallas lattice kernels (interpret mode on CPU) must match the scan path
exactly — values of alpha/beta and end-to-end loss + gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indic_cl_asr_tpu.ops import rnnt_loss as R
from indic_cl_asr_tpu.ops.rnnt_loss_pallas import (
    alpha_diagonals_pallas,
    beta_diagonals_pallas,
)


@pytest.fixture
def case(rng):
    B, T, U1 = 3, 7, 4
    lp_blank = jnp.asarray(
        -np.abs(rng.standard_normal((B, T, U1))), jnp.float32
    )
    lp_label = jnp.asarray(
        -np.abs(rng.standard_normal((B, T, U1))), jnp.float32
    )
    t_lens = jnp.array([7, 5, 3], jnp.int32)
    u_lens = jnp.array([3, 2, 1], jnp.int32)
    return lp_blank, lp_label, t_lens, u_lens


def test_alpha_kernel_matches_scan(case):
    lp_blank, lp_label, t_lens, u_lens = case
    lpb, lpl, _, _ = R._prepare(lp_blank, lp_label, t_lens, u_lens)
    want = np.asarray(R._alpha_scan(lpb, lpl))
    alpha_d = alpha_diagonals_pallas(
        R._to_diagonals(lpb, R.NEG_INF),
        R._to_diagonals(lpl, R.NEG_INF),
        interpret=True,
    )
    got = np.asarray(R._from_diagonals(alpha_d, lpb.shape[1]))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_beta_kernel_matches_scan(case):
    lp_blank, lp_label, t_lens, u_lens = case
    lpb, lpl, _, _ = R._prepare(lp_blank, lp_label, t_lens, u_lens)
    B, T, U1 = lpb.shape
    want = np.asarray(R._beta_scan(lpb, lpl, u_lens))

    pad_row = jnp.full((B, 1, U1), R.NEG_INF, lpb.dtype)
    lpb_e = jnp.concatenate([lpb, pad_row], axis=1)
    lpl_e = jnp.concatenate([lpl, pad_row], axis=1)
    beta_d = beta_diagonals_pallas(
        R._to_diagonals(lpb_e, R.NEG_INF),
        R._to_diagonals(lpl_e, R.NEG_INF),
        u_lens, T, interpret=True,
    )
    got = np.asarray(R._from_diagonals(beta_d, T + 1))
    # compare on reachable cells (t + u <= corner); unreachable cells hold
    # arbitrary very-negative values in both implementations
    mask = want > R.NEG_INF / 2
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(got[:, 0, 0], want[:, 0, 0], rtol=1e-6)


def test_full_loss_pallas_backend_matches_scan(case, monkeypatch):
    """Force the pallas backend (interpret) through the public rnnt loss
    and compare values + gradients to the scan backend."""
    lp_blank, lp_label, t_lens, u_lens = case

    def loss(lpb, lpl):
        return R.rnnt_nll_from_logprobs(lpb, lpl, t_lens, u_lens).sum()

    monkeypatch.setattr(R, "LATTICE_IMPL", "scan")
    v1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(lp_blank, lp_label)

    # interpret-mode pallas on CPU
    import indic_cl_asr_tpu.ops.rnnt_loss_pallas as P

    monkeypatch.setattr(R, "LATTICE_IMPL", "pallas")
    orig_a, orig_b = P.alpha_diagonals_pallas, P.beta_diagonals_pallas
    monkeypatch.setattr(
        P, "alpha_diagonals_pallas",
        lambda a, b, interpret=False: orig_a(a, b, interpret=True),
    )
    monkeypatch.setattr(
        P, "beta_diagonals_pallas",
        lambda a, b, u, T, interpret=False: orig_b(a, b, u, T,
                                                   interpret=True),
    )
    v2, g2 = jax.value_and_grad(loss, argnums=(0, 1))(lp_blank, lp_label)

    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
