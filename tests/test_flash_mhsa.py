"""Flash rel-pos MHSA kernel (ops/flash_mhsa.py) vs the XLA oracle.

Interpret-mode parity: values, all six gradients, padding lens, banded
context, and the fwd/bwd dropout-mask consistency contract.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indic_cl_asr_tpu.ops.flash_mhsa import (
    flash_relpos_mhsa,
    relpos_attention_reference,
)

B, T, H, D = 3, 150, 2, 32


def _inputs(seed=0, t=T):
    rng = np.random.default_rng(seed)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, t, H, D)), jnp.float32)
        for _ in range(3)
    )
    p = jnp.asarray(rng.standard_normal((2 * t - 1, H, D)), jnp.float32)
    u = jnp.asarray(0.1 * rng.standard_normal((H, D)), jnp.float32)
    vb = jnp.asarray(0.1 * rng.standard_normal((H, D)), jnp.float32)
    lens = jnp.asarray([t, max(1, t - 53), 1], jnp.int32)
    return q, k, v, p, u, vb, lens


def _flash_flat(q, k, v, p, u, vb, lens, **kw):
    """Adapter: [B,T,H,D] test fixtures -> the kernel's flat [B,T,E] API,
    result back to [B,T,H,D] for comparison against the oracle."""
    b, t, h, d = q.shape
    out = flash_relpos_mhsa(
        q.reshape(b, t, h * d), k.reshape(b, t, h * d),
        v.reshape(b, t, h * d), p.reshape(-1, h * d), u, vb, lens,
        n_heads=h, **kw,
    )
    return out.reshape(b, t, h, d)


@pytest.mark.parametrize("band", [(-1, -1), (20, 10), (16, -1)])
def test_forward_parity(band):
    q, k, v, p, u, vb, lens = _inputs()
    left, right = band
    out = _flash_flat(
        q, k, v, p, u, vb, lens, left=left, right=right, interpret=True
    )
    ref = relpos_attention_reference(
        q, k, v, p, u, vb, lens, left=left, right=right
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # padded query rows are zero (matches the XLA where(mask, attn, 0))
    assert float(jnp.abs(out[2, 1:]).max()) == 0.0


def test_gradient_parity():
    q, k, v, p, u, vb, lens = _inputs(1)
    cot = jnp.asarray(
        np.random.default_rng(9).standard_normal((B, T, H, D)), jnp.float32
    )

    def loss(fn, *args):
        return jnp.sum(fn(*args, lens) * cot)

    flash = functools.partial(
        _flash_flat, left=25, right=25, interpret=True
    )
    ref = functools.partial(relpos_attention_reference, left=25, right=25)
    g_fl = jax.grad(functools.partial(loss, flash), argnums=(0, 1, 2, 3, 4, 5))(
        q, k, v, p, u, vb
    )
    g_rf = jax.grad(functools.partial(loss, ref), argnums=(0, 1, 2, 3, 4, 5))(
        q, k, v, p, u, vb
    )
    for name, a, b in zip("qkvpuv", g_fl, g_rf):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4,
            err_msg=f"grad d{name}",
        )


def test_dropout_deterministic_and_consistent_bwd():
    q, k, v, p, u, vb, lens = _inputs(2)
    seed = jnp.asarray([17], jnp.int32)
    fn = functools.partial(
        _flash_flat, dropout_rate=0.5, dropout_seed=seed,
        interpret=True,
    )
    o1 = fn(q, k, v, p, u, vb, lens)
    o2 = fn(q, k, v, p, u, vb, lens)
    assert jnp.array_equal(o1, o2)
    o3 = _flash_flat(
        q, k, v, p, u, vb, lens, dropout_rate=0.5,
        dropout_seed=jnp.asarray([18], jnp.int32), interpret=True,
    )
    assert not jnp.array_equal(o1, o3)

    # out is LINEAR in v, so <G, f(v+E) - f(v)> == <df/dv, E> holds exactly
    # iff the backward pass regenerates the same dropout mask as forward
    rng = np.random.default_rng(3)
    E = jnp.asarray(rng.standard_normal(v.shape), jnp.float32)
    G = jnp.asarray(rng.standard_normal(o1.shape), jnp.float32)
    dv = jax.grad(lambda vv: jnp.sum(fn(q, k, vv, p, u, vb, lens) * G))(v)
    lhs = float(jnp.sum(G * (fn(q, k, v + E, p, u, vb, lens) - o1)))
    rhs = float(jnp.sum(dv * E))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_dropout_rate():
    q, k, v, p, u, vb, lens = _inputs(4)
    # rate statistics: with v==1 and full-visibility rows, out rows are
    # sum of kept probabilities / keep_p -> mean ~ 1
    v1 = jnp.ones_like(v)
    out = _flash_flat(
        q, k, v1, p, u, vb, lens, dropout_rate=0.3,
        dropout_seed=jnp.asarray([5], jnp.int32), interpret=True,
    )
    valid = np.asarray(out[0])  # full-length row
    assert abs(valid.mean() - 1.0) < 0.1


def test_too_long_raises():
    q, k, v, p, u, vb, lens = _inputs()
    big = jnp.zeros((B, 600, H * D), jnp.float32)
    with pytest.raises(ValueError):
        flash_relpos_mhsa(
            big, big, big,
            jnp.zeros((1199, H * D), jnp.float32), u, vb, lens,
            n_heads=H, interpret=True,
        )


def _enc_cfg(**kw):
    from indic_cl_asr_tpu.models.conformer import ConformerConfig

    return ConformerConfig(
        feat_in=32, n_layers=2, d_model=64, n_heads=2, conv_kernel_size=7,
        dropout=0.0, dropout_pre_encoder=0.0, dropout_att=0.0, **kw
    )


@pytest.mark.parametrize("scan", [False, True])
def test_encoder_flash_matches_xla(scan):
    from indic_cl_asr_tpu.models.conformer import ConformerEncoder

    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.standard_normal((2, 32, 64)), jnp.float32)
    lens = jnp.asarray([64, 37], jnp.int32)

    enc_x = ConformerEncoder(_enc_cfg(scan_layers=scan, attn_impl="xla"))
    enc_f = ConformerEncoder(_enc_cfg(scan_layers=scan, attn_impl="flash"))
    variables = enc_x.init(jax.random.PRNGKey(0), feats, lens, False)
    out_x, l_x = enc_x.apply(variables, feats, lens, False)
    out_f, l_f = enc_f.apply(variables, feats, lens, False)
    assert jnp.array_equal(l_x, l_f)
    np.testing.assert_allclose(
        np.asarray(out_x), np.asarray(out_f), atol=2e-5, rtol=2e-4
    )


def test_encoder_flash_banded_matches_xla():
    from indic_cl_asr_tpu.models.conformer import ConformerEncoder

    rng = np.random.default_rng(8)
    feats = jnp.asarray(rng.standard_normal((2, 32, 64)), jnp.float32)
    lens = jnp.asarray([64, 29], jnp.int32)
    kw = dict(att_context_size=(4, 2))
    enc_x = ConformerEncoder(_enc_cfg(attn_impl="xla", **kw))
    enc_f = ConformerEncoder(_enc_cfg(attn_impl="flash", **kw))
    variables = enc_x.init(jax.random.PRNGKey(1), feats, lens, False)
    out_x, _ = enc_x.apply(variables, feats, lens, False)
    out_f, _ = enc_f.apply(variables, feats, lens, False)
    np.testing.assert_allclose(
        np.asarray(out_x), np.asarray(out_f), atol=2e-5, rtol=2e-4
    )


def test_encoder_flash_train_grads_finite():
    """Train mode (attention dropout on) through the flash path: values and
    grads finite, loss decreasing not required — this is a smoke of the
    custom-VJP composition inside the scanned stack."""
    from indic_cl_asr_tpu.models.conformer import ConformerEncoder

    cfg = _enc_cfg(scan_layers=True, attn_impl="flash")
    cfg = __import__("dataclasses").replace(cfg, dropout_att=0.3)
    rng = np.random.default_rng(9)
    feats = jnp.asarray(rng.standard_normal((2, 32, 64)), jnp.float32)
    lens = jnp.asarray([64, 40], jnp.int32)
    enc = ConformerEncoder(cfg)
    variables = enc.init(jax.random.PRNGKey(2), feats, lens, False)

    def loss(params):
        out, _ = enc.apply(
            {**variables, "params": params}, feats, lens, True,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        return jnp.sum(out**2)

    val, grads = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(val))
    flat = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in flat)


def test_flash_under_pjit_mesh():
    """The kernel must compose with GSPMD sharding (DP x TP mesh training
    is driver-level: scripts --mesh.data/--mesh.model). Batch-sharded
    inputs through the flash encoder on the 4x2 CPU mesh: finite loss and
    grads, and the loss matches the unsharded single-device value."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from indic_cl_asr_tpu.models.conformer import ConformerEncoder

    cfg = _enc_cfg(scan_layers=True, attn_impl="flash")
    enc = ConformerEncoder(cfg)
    rng = np.random.default_rng(11)
    feats = jnp.asarray(rng.standard_normal((8, 32, 64)), jnp.float32)
    lens = jnp.full((8,), 64, jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), feats, lens, False)

    def loss(params, f, l):
        out, _ = enc.apply({**variables, "params": params}, f, l, False)
        return jnp.sum(out**2)

    base = float(jax.jit(loss)(variables["params"], feats, lens))
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    with mesh:
        fs = jax.device_put(feats, NamedSharding(mesh, P("data")))
        ls = jax.device_put(lens, NamedSharding(mesh, P("data")))
        val = float(jax.jit(loss)(variables["params"], fs, ls))
        grads = jax.jit(jax.grad(loss))(variables["params"], fs, ls)
    np.testing.assert_allclose(val, base, rtol=1e-5)
    assert all(bool(jnp.isfinite(g).all()) for g in jax.tree.leaves(grads))


@pytest.mark.parametrize("t,heads", [(128, 1), (129, 2), (512, 2), (7, 2)])
def test_edge_shapes(t, heads):
    """Block-boundary T values and single-head: parity vs the oracle."""
    rng = np.random.default_rng(t)
    d = 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((2, t, heads, d)), jnp.float32)
        for _ in range(3)
    )
    p = jnp.asarray(
        rng.standard_normal((2 * t - 1, heads, d)), jnp.float32
    )
    u = jnp.zeros((heads, d), jnp.float32)
    vb = jnp.zeros((heads, d), jnp.float32)
    lens = jnp.asarray([t, max(1, t - 3)], jnp.int32)
    out = flash_relpos_mhsa(
        q.reshape(2, t, -1), k.reshape(2, t, -1), v.reshape(2, t, -1),
        p.reshape(-1, heads * d), u, vb, lens, n_heads=heads,
        interpret=True,
    ).reshape(2, t, heads, d)
    ref = relpos_attention_reference(q, k, v, p, u, vb, lens)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5
    )
