import jax
import jax.numpy as jnp
import numpy as np

from indic_cl_asr_tpu.models.conformer import ConformerConfig, ConformerEncoder
from indic_cl_asr_tpu.parallel.distributed import (
    all_hosts_agree,
    barrier,
    broadcast_from_main,
    is_main_process,
    setup_distributed,
)

TINY = dict(
    feat_in=16, n_layers=1, d_model=32, n_heads=2, ff_expansion_factor=2,
    conv_kernel_size=3, subsampling_factor=4, dropout=0.0, dropout_att=0.0,
    dropout_pre_encoder=0.0,
)


def test_limited_context_differs_from_full_and_respects_band(rng):
    feats = jnp.asarray(rng.standard_normal((1, 16, 64)), jnp.float32)
    lens = jnp.array([64], jnp.int32)
    full = ConformerEncoder(ConformerConfig(**TINY))
    variables = full.init(jax.random.PRNGKey(0), feats, lens)
    out_full, _ = full.apply(variables, feats, lens)

    limited = ConformerEncoder(
        ConformerConfig(**TINY, att_context_size=(2, 2))
    )
    out_lim, _ = limited.apply(variables, feats, lens)
    assert not np.allclose(np.asarray(out_full), np.asarray(out_lim))

    # causal-style right=0: changing FUTURE frames must not change frame 0
    # beyond the conv halo (kernel 3 -> halo 1, subsample 4 -> input halo)
    causal = ConformerEncoder(
        ConformerConfig(**TINY, att_context_size=(-1, 0))
    )
    out_a, _ = causal.apply(variables, feats, lens)
    feats_b = feats.at[:, :, 40:].set(5.0)
    out_b, _ = causal.apply(variables, feats_b, lens)
    np.testing.assert_allclose(
        np.asarray(out_a)[0, :7], np.asarray(out_b)[0, :7], atol=1e-4
    )


def test_distributed_single_host_noops():
    idx, count = setup_distributed()
    assert idx == 0 and count == 1
    assert is_main_process()
    barrier()  # no-op, must not hang
    tree = {"a": jnp.ones(3)}
    out = broadcast_from_main(tree)
    np.testing.assert_array_equal(np.asarray(out["a"]), 1.0)
    assert all_hosts_agree(42)
