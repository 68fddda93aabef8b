"""Scanned (lax.scan over stacked [L, ...] params) Conformer layer stack:
parity with the unrolled encoder, frozen-prefix gradient cut, optimizer
row-freeze, and checkpoint-converter layout equivalence.

The scanned stack is the TPU-idiomatic depth dimension (one layer body in
the compiled program; the reference unrolls an nn.ModuleList,
conformer_encoder.py:576-640). It exists for compile-time/program-size
reasons; math must be identical to the unrolled loop."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from indic_cl_asr_tpu.models.conformer import (
    ConformerConfig,
    ConformerEncoder,
    stack_encoder_layers,
)
from indic_cl_asr_tpu.train.state import (
    apply_updates,
    make_optimizer,
    zero_stacked_prefix,
)

TINY = ConformerConfig(
    feat_in=32, n_layers=3, d_model=64, n_heads=4, ff_expansion_factor=2,
    conv_kernel_size=7, subsampling_factor=4, dropout=0.0, dropout_att=0.0,
    dropout_pre_encoder=0.0,
)
SCAN = dataclasses.replace(TINY, scan_layers=True)

# XLA CPU's fast transcendental approximations (sigmoid/erf) differ between
# fusion contexts, so scan-vs-unrolled is only bit-approximate on the CPU
# test harness (~1e-3 per layer); structural errors would be O(1).
ATOL = 2e-2


def _inputs(B=2, T=64, feat_in=32):
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, feat_in, T)), jnp.float32
    )
    lens = jnp.array([T, T // 2], jnp.int32)[:B]
    return feats, lens


def _stacked_variables(variables, n_layers):
    return {
        "params": stack_encoder_layers(variables["params"], n_layers),
        "batch_stats": stack_encoder_layers(
            variables["batch_stats"], n_layers
        ),
    }


def test_scan_matches_unrolled_eval():
    feats, lens = _inputs()
    unrolled = ConformerEncoder(TINY)
    variables = unrolled.init(jax.random.PRNGKey(0), feats, lens, train=False)
    want, want_lens = unrolled.apply(variables, feats, lens, train=False)

    scanned = ConformerEncoder(SCAN)
    sv = _stacked_variables(variables, TINY.n_layers)
    got, got_lens = scanned.apply(sv, feats, lens, train=False)

    np.testing.assert_array_equal(np.asarray(got_lens), np.asarray(want_lens))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=ATOL
    )


def test_scan_param_structure_matches_stacked_unrolled():
    feats, lens = _inputs()
    unrolled = ConformerEncoder(TINY).init(
        jax.random.PRNGKey(0), feats, lens, train=False
    )
    scanned = ConformerEncoder(SCAN).init(
        jax.random.PRNGKey(0), feats, lens, train=False
    )
    restacked = _stacked_variables(unrolled, TINY.n_layers)
    for col in ("params", "batch_stats"):
        a = jax.tree.map(lambda x: x.shape, scanned[col])
        b = jax.tree.map(lambda x: x.shape, restacked[col])
        assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(
            b
        ), col
        assert jax.tree.leaves(a) == jax.tree.leaves(b), col


def test_scan_batch_stats_update_matches_unrolled():
    feats, lens = _inputs()
    unrolled = ConformerEncoder(TINY)
    variables = unrolled.init(jax.random.PRNGKey(0), feats, lens, train=False)
    _, mut_u = unrolled.apply(
        variables, feats, lens, train=True, mutable=["batch_stats"],
    )
    scanned = ConformerEncoder(SCAN)
    sv = _stacked_variables(variables, TINY.n_layers)
    _, mut_s = scanned.apply(
        sv, feats, lens, train=True, mutable=["batch_stats"],
    )
    want = stack_encoder_layers(mut_u["batch_stats"], TINY.n_layers)
    got = mut_s["batch_stats"]
    for (pw, w), (pg, g) in zip(
        jax.tree_util.tree_flatten_with_path(want)[0],
        jax.tree_util.tree_flatten_with_path(got)[0],
    ):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=ATOL)


def test_scan_frozen_till_cuts_gradients_per_row():
    cfg = dataclasses.replace(SCAN, frozen_till=1)
    feats, lens = _inputs()
    enc = ConformerEncoder(cfg)
    variables = enc.init(jax.random.PRNGKey(0), feats, lens, train=False)

    def loss_fn(params):
        out, _ = enc.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, lens, train=False,
        )
        return jnp.sum(out**2)

    grads = jax.grad(loss_fn)(variables["params"])
    # frozen prefix: everything below the cut has zero grads
    pre = jax.tree.map(
        lambda x: float(jnp.sum(jnp.abs(x))), grads["pre_encode"]
    )
    assert all(v == 0.0 for v in jax.tree.leaves(pre))
    stack = grads["stack"]["layers"]
    q = stack["self_attn"]["linear_q"]["kernel"]  # [L, d, d]
    rows = np.asarray(jnp.sum(jnp.abs(q), axis=(1, 2)))
    assert rows[0] == 0.0  # frozen row
    assert (rows[1:] > 0.0).all()  # trainable rows


def test_scan_frozen_output_matches_unfrozen():
    """frozen_till splits the scan into two segments — forward math must be
    unchanged by the split."""
    feats, lens = _inputs()
    enc0 = ConformerEncoder(SCAN)
    variables = enc0.init(jax.random.PRNGKey(0), feats, lens, train=False)
    want, _ = enc0.apply(variables, feats, lens, train=False)
    enc2 = ConformerEncoder(dataclasses.replace(SCAN, frozen_till=2))
    got, _ = enc2.apply(variables, feats, lens, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)


def test_zero_stacked_prefix_freezes_rows_against_weight_decay():
    L, d = 4, 3
    params = {
        "encoder": {
            "stack": {"layers": {"w": jnp.ones((L, d))}},
            "pre_encode": {"w": jnp.ones((d,))},
        }
    }
    # grads already zero in frozen rows (the model's stop-gradient cut)
    g_stack = jnp.concatenate(
        [jnp.zeros((2, d)), jnp.full((L - 2, d), 0.5)], axis=0
    )
    grads = {
        "encoder": {
            "stack": {"layers": {"w": g_stack}},
            "pre_encode": {"w": jnp.zeros((d,))},
        }
    }
    tx = make_optimizer(
        lr=1e-2, weight_decay=0.1, stacked_freeze_till=2
    )
    opt_state = tx.init(params)
    updates, _ = tx.update(grads, opt_state, params)
    # updates stay row-sliced on stacked leaves; the frozen prefix rows
    # are never touched by apply_updates (train.state, not optax)
    u_stack = updates["encoder"]["stack"]["layers"]["w"]
    assert u_stack.shape == (L - 2, d)
    new = apply_updates(params, updates)
    w = np.asarray(new["encoder"]["stack"]["layers"]["w"])
    # frozen rows: zero grads AND no weight-decay drift
    np.testing.assert_array_equal(w[:2], 1.0)
    # trainable rows moved
    assert (np.abs(w[2:] - 1.0) > 1e-5).all()
    # non-stack leaves with zero grads still decay (AdamW semantics kept)
    assert np.abs(
        np.asarray(new["encoder"]["pre_encode"]["w"]) - 1.0
    ).max() > 1e-5


def test_zero_stacked_prefix_standalone():
    tx = zero_stacked_prefix(1)
    upd = {"encoder": {"stack": {"layers": {"w": jnp.ones((3, 2))}}}}
    out, _ = tx.update(upd, tx.init(upd))
    w = np.asarray(out["encoder"]["stack"]["layers"]["w"])
    np.testing.assert_array_equal(w[0], 0.0)
    np.testing.assert_array_equal(w[1:], 1.0)


def test_convert_nemo_state_dict_scan_layout(rng):
    from indic_cl_asr_tpu.models.conformer import subsampled_feat_dim
    from indic_cl_asr_tpu.models.pretrained import convert_nemo_state_dict
    from indic_cl_asr_tpu.models.hybrid import tiny_config
    from tests.test_pretrained_convert import make_fake_nemo_sd

    cfg = tiny_config()
    lang_keys = ["hi", "bn", "mr", "te"]
    sd = make_fake_nemo_sd(cfg, lang_keys, rng)
    kw = dict(
        n_layers=cfg.encoder.n_layers,
        sampling_num=cfg.encoder.sampling_num,
        subsampled_feat=subsampled_feat_dim(cfg.encoder),
        conv_channels=cfg.encoder.conv_channels,
        language_keys=lang_keys,
    )
    flat = convert_nemo_state_dict(sd, **kw)
    stacked = convert_nemo_state_dict(sd, scan_layers=True, **kw)
    for col in ("params", "batch_stats"):
        want = {
            **flat[col],
            "encoder": stack_encoder_layers(
                flat[col]["encoder"], cfg.encoder.n_layers
            ),
        }
        for (pw, w), (pg, g) in zip(
            jax.tree_util.tree_flatten_with_path(want)[0],
            jax.tree_util.tree_flatten_with_path(stacked[col])[0],
        ):
            assert pw == pg
            np.testing.assert_allclose(np.asarray(g), np.asarray(w))


def test_partial_save_restores_across_layouts(tmp_path):
    """save_partial from one encoder layout loads into the other
    (utils/checkpoint.py layout conversion)."""
    import jax
    from indic_cl_asr_tpu.models.conformer import ConformerEncoder
    from indic_cl_asr_tpu.utils.checkpoint import load_partial, save_partial
    from indic_cl_asr_tpu.utils.pytree import named_leaves

    feats = jnp.zeros((1, TINY.feat_in, 32), jnp.float32)
    lens = jnp.array([32], jnp.int32)
    unrolled = {"encoder": ConformerEncoder(TINY).init(
        jax.random.PRNGKey(0), feats, lens, train=False
    )["params"]}
    scanned_init = {"encoder": ConformerEncoder(SCAN).init(
        jax.random.PRNGKey(7), feats, lens, train=False
    )["params"]}
    all_true = jax.tree.map(lambda _: True, unrolled)

    # unrolled save -> scanned tree
    p1 = str(tmp_path / "unrolled.npz")
    save_partial(p1, unrolled, all_true)
    got = load_partial(p1, scanned_init)
    want = {"encoder": stack_encoder_layers(
        unrolled["encoder"], TINY.n_layers
    )}
    for k, v in named_leaves(want).items():
        np.testing.assert_allclose(
            np.asarray(named_leaves(got)[k]), np.asarray(v), err_msg=k
        )

    # scanned save -> unrolled tree (round trip back)
    p2 = str(tmp_path / "scanned.npz")
    save_partial(p2, got, jax.tree.map(lambda _: True, got))
    back = load_partial(p2, unrolled)
    for k, v in named_leaves(unrolled).items():
        np.testing.assert_allclose(
            np.asarray(named_leaves(back)[k]), np.asarray(v), err_msg=k
        )
