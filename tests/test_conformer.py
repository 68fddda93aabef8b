import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indic_cl_asr_tpu.models.conformer import (
    ConformerConfig,
    ConformerEncoder,
    _rel_shift,
    rel_positional_encoding,
    subsampled_feat_dim,
    subsampled_length,
)

TINY = ConformerConfig(
    feat_in=32, n_layers=2, d_model=64, n_heads=4, ff_expansion_factor=2,
    conv_kernel_size=7, subsampling_factor=4, dropout=0.0, dropout_att=0.0,
    dropout_pre_encoder=0.0,
)


def init_encoder(cfg, B=2, T=64):
    enc = ConformerEncoder(cfg)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, cfg.feat_in, T)),
        jnp.float32,
    )
    lens = jnp.array([T, T // 2], jnp.int32)[:B]
    variables = enc.init(jax.random.PRNGKey(0), feats, lens, train=False)
    return enc, variables, feats, lens


def test_rel_shift_matches_direct_gather():
    B, H, T = 2, 3, 5
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, H, T, 2 * T - 1)),
        jnp.float32,
    )
    got = np.asarray(_rel_shift(x))
    xn = np.asarray(x)
    want = np.zeros((B, H, T, T), np.float32)
    for t in range(T):
        for j in range(T):
            want[:, :, t, j] = xn[:, :, t, (T - 1) + (j - t)]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_rel_positional_encoding_structure():
    pe = rel_positional_encoding(4, 8)
    assert pe.shape == (7, 8)
    # center row = position 0 -> sin(0)=0, cos(0)=1
    np.testing.assert_allclose(pe[3, 0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(pe[3, 1::2], 1.0, atol=1e-7)


def test_subsampled_length_matches_torch_conv_formula():
    import torch

    lens = np.array([1, 7, 16, 63, 64, 101, 999])
    got = np.asarray(subsampled_length(jnp.asarray(lens), TINY))
    conv = torch.nn.Conv1d(1, 1, kernel_size=3, stride=2, padding=1)
    for l, g in zip(lens, got):
        x = torch.zeros(1, 1, int(l))
        out = conv(conv(x))
        assert out.shape[-1] == g


def test_encoder_shapes_and_lengths():
    enc, variables, feats, lens = init_encoder(TINY)
    out, out_lens = enc.apply(variables, feats, lens, train=False)
    assert out.shape == (2, 16, TINY.d_model)
    np.testing.assert_array_equal(
        np.asarray(out_lens), np.asarray(subsampled_length(lens, TINY))
    )
    # padded frames are zeroed
    assert np.all(np.asarray(out)[1, int(out_lens[1]) :, :] == 0.0)
    assert "batch_stats" in variables  # conv-module BN state exists


def test_padding_invariance():
    """Extending padding must not change valid-frame outputs (masking is
    correct end-to-end through attention + conv)."""
    cfg = TINY
    enc = ConformerEncoder(cfg)
    rng = np.random.default_rng(2)
    T_valid = 40
    feats_short = jnp.asarray(
        rng.standard_normal((1, cfg.feat_in, 48)), jnp.float32
    )
    feats_short = feats_short.at[:, :, T_valid:].set(0.0)
    feats_long = jnp.pad(feats_short, ((0, 0), (0, 0), (0, 16)))
    lens = jnp.array([T_valid], jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), feats_short, lens, train=False)
    out_s, len_s = enc.apply(variables, feats_short, lens, train=False)
    out_l, len_l = enc.apply(variables, feats_long, lens, train=False)
    assert int(len_s[0]) == int(len_l[0])
    n = int(len_s[0]) - 1  # last valid frame sees conv halo from pad edge
    np.testing.assert_allclose(
        np.asarray(out_s)[0, :n], np.asarray(out_l)[0, :n], atol=2e-5
    )


def test_frozen_till_stops_gradients():
    cfg = ConformerConfig(
        **{**TINY.__dict__, "frozen_till": 1}
    )
    enc = ConformerEncoder(cfg)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, cfg.feat_in, 32)),
        jnp.float32,
    )
    lens = jnp.array([32], jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), feats, lens, train=False)

    def loss_fn(params):
        out, _ = enc.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, lens, train=False,
        )
        return jnp.sum(out**2)

    grads = jax.grad(loss_fn)(variables["params"])
    g = jax.tree.map(lambda x: float(jnp.sum(jnp.abs(x))), grads)
    assert g["pre_encode"]["conv_0"]["kernel"] == 0.0
    assert g["layers_0"]["self_attn"]["linear_q"]["kernel"] == 0.0
    assert g["layers_1"]["self_attn"]["linear_q"]["kernel"] > 0.0


def test_train_mode_updates_batch_stats():
    enc, variables, feats, lens = init_encoder(TINY)
    out, mutated = enc.apply(
        variables, feats, lens, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(before, after)
    )
