"""Longformer-style local+global attention (reference
multi_head_attention.py:253): global tokens attend to / are attended from
every valid position; other tokens see the band plus the global keys."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indic_cl_asr_tpu.models.conformer import (
    ConformerConfig,
    RelPosSelfAttention,
    rel_positional_encoding_dev,
)

BASE = ConformerConfig(
    feat_in=32, n_layers=1, d_model=32, n_heads=2, dropout=0.0,
    dropout_att=0.0,
)


def _band_mask(T, w):
    q = np.arange(T)[:, None]
    k = np.arange(T)[None, :]
    return jnp.asarray(np.abs(q - k) <= w)[None]  # [1, T, T]


def _run(cfg, x, att_mask, key=0):
    mod = RelPosSelfAttention(cfg)
    pe = rel_positional_encoding_dev(x.shape[1], cfg.d_model)
    variables = mod.init(jax.random.PRNGKey(key), x, pe, att_mask, True)
    return variables, mod.apply(variables, x, pe, att_mask, True)


def test_global_token_sees_outside_band():
    """Perturbing a far token changes the global row's output, while a
    non-global row outside its band stays unchanged."""
    T, w, g = 16, 2, 0
    cfg = dataclasses.replace(BASE, global_tokens=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, T, cfg.d_model)), jnp.float32)
    mask = _band_mask(T, w)
    variables, out = _run(cfg, x, mask)

    x2 = x.at[0, T - 1].add(1.0)  # far from both row g and row 5's band
    mod = RelPosSelfAttention(cfg)
    pe = rel_positional_encoding_dev(T, cfg.d_model)
    out2 = mod.apply(variables, x2, pe, mask, True)

    d = np.abs(np.asarray(out2 - out))[0]
    assert d[g].max() > 1e-6          # global row sees the far token
    assert d[5].max() < 1e-7          # row 5: T-1 is out of band, not global


def test_all_rows_attend_to_global_key():
    """Perturbing the GLOBAL token changes every valid row's output even
    far outside the band."""
    T, w = 16, 2
    cfg = dataclasses.replace(BASE, global_tokens=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, T, cfg.d_model)), jnp.float32)
    mask = _band_mask(T, w)
    variables, out = _run(cfg, x, mask)

    x2 = x.at[0, 0].add(1.0)  # the global token
    mod = RelPosSelfAttention(cfg)
    pe = rel_positional_encoding_dev(T, cfg.d_model)
    out2 = mod.apply(variables, x2, pe, mask, True)
    d = np.abs(np.asarray(out2 - out))[0]
    assert (d.max(axis=-1) > 1e-6).all()  # every row changed

    # without global tokens the same perturbation stays inside the band
    cfg0 = dataclasses.replace(BASE, global_tokens=0)
    variables0, out0 = _run(cfg0, x, mask)
    out0b = RelPosSelfAttention(cfg0).apply(variables0, x2, pe, mask, True)
    d0 = np.abs(np.asarray(out0b - out0))[0]
    assert d0[10].max() < 1e-7  # row 10: token 0 is out of band


def test_global_tokens_spacing_and_separate_projections():
    T, w = 16, 2
    cfg = dataclasses.replace(
        BASE, global_tokens=2, global_tokens_spacing=4,
        global_attn_separate=True,
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, T, cfg.d_model)), jnp.float32)
    mask = _band_mask(T, w)
    variables, out = _run(cfg, x, mask)
    assert "global_q" in variables["params"]
    assert "global_k" in variables["params"]
    assert "global_v" in variables["params"]
    assert out.shape == (1, T, cfg.d_model)

    # tokens 0 and 4 are global: perturbing token 4 reaches row 12
    x2 = x.at[0, 4].add(1.0)
    pe = rel_positional_encoding_dev(T, cfg.d_model)
    out2 = RelPosSelfAttention(cfg).apply(variables, x2, pe, mask, True)
    d = np.abs(np.asarray(out2 - out))[0]
    assert d[12].max() > 1e-6


def test_no_global_tokens_param_tree_unchanged():
    """global_tokens=0 must not add parameters (checkpoint compatibility)."""
    T, w = 8, 2
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, T, BASE.d_model)), jnp.float32)
    mask = _band_mask(T, w)
    v0, _ = _run(BASE, x, mask)
    v1, _ = _run(dataclasses.replace(BASE, global_tokens=1), x, mask)
    assert set(v0["params"].keys()) == set(v1["params"].keys())
