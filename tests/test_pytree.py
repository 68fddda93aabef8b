import jax.numpy as jnp
import numpy as np

from indic_cl_asr_tpu.utils import pytree as pt


def make_params():
    return {
        "encoder": {
            "pre_encode": {"conv": {"kernel": jnp.ones((2, 2))}},
            "layers_0": {"ffn": {"kernel": jnp.ones((3,))}},
            "layers_11": {"ffn": {"kernel": jnp.ones((3,))}},
            "layers_12": {"ffn": {"kernel": jnp.ones((3,))}},
            "layers_16": {"ffn": {"kernel": jnp.ones((3,))}},
        },
        "joint": {"dense": {"kernel": jnp.ones((4,))}},
    }


def test_named_leaves_paths():
    named = pt.named_leaves(make_params())
    assert "encoder/layers_12/ffn/kernel" in named
    assert "joint/dense/kernel" in named


def test_conformer_freeze_mask_matches_reference_policy():
    # reference utils.py:246-263: freeze preprocessor/pre-encode and layers < 12
    params = make_params()
    mask = pt.conformer_freeze_mask(params, freeze_encoder_till=12)
    named = pt.named_leaves(mask)
    assert named["encoder/pre_encode/conv/kernel"] is False
    assert named["encoder/layers_0/ffn/kernel"] is False
    assert named["encoder/layers_11/ffn/kernel"] is False
    assert named["encoder/layers_12/ffn/kernel"] is True
    assert named["encoder/layers_16/ffn/kernel"] is True
    assert named["joint/dense/kernel"] is True

    # freeze_encoder_till=0 trains everything
    mask0 = pt.conformer_freeze_mask(params, freeze_encoder_till=0)
    assert all(pt.named_leaves(mask0).values())


def test_mask_select_and_partial_load():
    params = make_params()
    mask = pt.conformer_freeze_mask(params, freeze_encoder_till=12)
    saved = pt.mask_select(params, mask)
    # only trainable leaves saved (partial state dict, utils.py:265-271)
    assert "encoder/layers_0/ffn/kernel" not in saved
    assert "encoder/layers_12/ffn/kernel" in saved

    modified = {k: v * 5.0 for k, v in saved.items()}
    restored = pt.tree_update_from_named(params, modified)
    named = pt.named_leaves(restored)
    np.testing.assert_allclose(named["encoder/layers_12/ffn/kernel"], 5.0)
    np.testing.assert_allclose(named["encoder/layers_0/ffn/kernel"], 1.0)


def test_regex_mask_and_count():
    params = make_params()
    mask = pt.regex_mask(params, [r"joint/"])
    named = pt.named_leaves(mask)
    assert named["joint/dense/kernel"] is True
    assert named["encoder/layers_0/ffn/kernel"] is False
    assert pt.count_params(params) == 4 + 3 * 4 + 4
