import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from indic_cl_asr_tpu.train.logger import Logger
from indic_cl_asr_tpu.utils import pytree as pt
from indic_cl_asr_tpu.utils.checkpoint import (
    SequenceCheckpointer,
    load_partial,
    load_pytree,
    save_partial,
    save_pytree,
)


def test_logger_text_jsonl_and_epoch_average(tmp_path):
    logger = Logger(str(tmp_path), run_id="test", use_wandb=False)
    logger.log({"train_loss": 2.0, "note": "hello"})
    logger.log({"train_loss": 4.0})
    avg = logger.log_epoch_average()
    assert avg == {"epoch_avg_train_loss": 3.0}
    logger.close()

    lines = open(tmp_path / "test" / "log.txt").read().strip().splitlines()
    assert len(lines) == 3
    rec = json.loads(lines[0])
    assert rec["train_loss"] == 2.0 and rec["note"] == "hello"
    assert json.loads(lines[2])["epoch_avg_train_loss"] == 3.0
    assert os.path.exists(tmp_path / "test" / "metrics.jsonl")


def test_pytree_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
    save_pytree(str(tmp_path / "ckpt"), tree)
    restored = load_pytree(str(tmp_path / "ckpt"), like=tree)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(4.0))
    np.testing.assert_array_equal(
        np.asarray(restored["b"]["c"]), np.ones((2, 3))
    )


def test_partial_save_restore(tmp_path):
    params = {
        "enc": {"w": jnp.ones(3)},
        "head": {"w": jnp.full((2,), 2.0)},
    }
    mask = pt.path_mask(params, lambda p: p.startswith("head"))
    p = str(tmp_path / "partial.npz")
    save_partial(p, params, mask)

    fresh = jax.tree.map(jnp.zeros_like, params)
    restored = load_partial(p, fresh)
    np.testing.assert_array_equal(np.asarray(restored["head"]["w"]), 2.0)
    np.testing.assert_array_equal(np.asarray(restored["enc"]["w"]), 0.0)


def test_sequence_checkpointer_resume(tmp_path):
    ckpt = SequenceCheckpointer(str(tmp_path / "seq"))
    assert ckpt.latest_task() is None
    state = {"params": {"w": jnp.arange(3.0)}}
    ckpt.save_task(0, "hindi", state, {"hindi": [{"rnnt_wer": 0.4}]})
    ckpt.save_task(1, "bengali", state, {"hindi": [{"rnnt_wer": 0.4}]})
    assert ckpt.latest_task() == (1, "bengali")
    restored = ckpt.load_task(1, "bengali", state)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(3.0)
    )
    m = ckpt.manifest()
    assert m["completed_tasks"] == ["hindi", "bengali"]


def test_sequence_checkpointer_full_train_state_roundtrip(tmp_path):
    """ADVICE r1 (medium): save_task must checkpoint the FULL TrainState —
    including optimizer state — in a form run_sequence's load_task(idx, lang,
    fresh_state) actually restores."""
    import optax

    from indic_cl_asr_tpu.models.hybrid import init_model, tiny_config
    from indic_cl_asr_tpu.train.state import create_train_state, make_optimizer
    from indic_cl_asr_tpu.utils.pytree import conformer_freeze_mask

    cfg = tiny_config()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    mask = conformer_freeze_mask(variables["params"], 1)
    tx = make_optimizer(lr=1e-3, trainable_mask=mask)
    state = create_train_state(variables, tx)
    # advance the optimizer so mu/nu/step are non-trivial
    grads = jax.tree.map(jnp.ones_like, state.params)
    updates, opt2 = tx.update(grads, state.opt_state, state.params)
    state = state.replace(
        step=jnp.asarray(7, jnp.int32),
        params=optax.apply_updates(state.params, updates),
        opt_state=opt2,
    )

    ckpt = SequenceCheckpointer(str(tmp_path / "seq"))
    ckpt.save_task(0, "hindi", state, {"hindi": [{"rnnt_wer": 0.4}]})

    # fresh state, as run_sequence builds it before resume
    _, fresh_vars = init_model(cfg, jax.random.PRNGKey(1))
    fresh = create_train_state(fresh_vars, tx)
    restored = ckpt.load_task(0, "hindi", fresh)

    assert int(restored.step) == 7
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        restored.params, state.params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        restored.opt_state, state.opt_state,
    )


def test_log_bwt_curves_writes_json(tmp_path):
    import json as _json

    from indic_cl_asr_tpu.train.logger import Logger

    lg = Logger(output_dir=str(tmp_path), run_id="r", use_wandb=False)
    curves = {"hindi": [(2, -0.05), (3, -0.1)], "bengali": []}
    lg.log_bwt_curves(curves)
    lg.close()
    with open(f"{lg.dir}/bwt_curves.json") as f:
        got = _json.load(f)
    assert got["hindi"] == [[2, -0.05], [3, -0.1]]
    assert got["bengali"] == []


def test_frozen_prefix_partial_save_into_scanned_layout(tmp_path):
    """ADVICE r2: a partial save with a frozen encoder prefix contains
    only the trainable layers; restoring into the scanned layout must
    fill the missing stacked rows from the target params, not raise."""
    import dataclasses

    from indic_cl_asr_tpu.models.hybrid import init_model, tiny_config
    from indic_cl_asr_tpu.utils.checkpoint import load_partial, save_partial
    from indic_cl_asr_tpu.utils.pytree import conformer_freeze_mask

    base = tiny_config()
    unrolled_cfg = dataclasses.replace(
        base, encoder=dataclasses.replace(base.encoder, scan_layers=False)
    )
    scanned_cfg = dataclasses.replace(
        base, encoder=dataclasses.replace(base.encoder, scan_layers=True)
    )
    _, unrolled = init_model(unrolled_cfg, jax.random.PRNGKey(0))
    # freeze layers [0, 1): only layers 1.. are in the partial save
    mask = conformer_freeze_mask(unrolled["params"], 1)
    p = str(tmp_path / "frozen_partial.npz")
    save_partial(p, unrolled["params"], mask)
    with np.load(p) as data:
        assert not any("layers_0/" in k for k in data.files)
        assert any("layers_1/" in k for k in data.files)

    _, scanned = init_model(scanned_cfg, jax.random.PRNGKey(1))
    restored = load_partial(p, scanned["params"])
    # trainable rows come from the save; frozen row 0 keeps the target's
    stack = restored["encoder"]["stack"]["layers"]
    src_l1 = unrolled["params"]["encoder"]["layers_1"]
    tgt_stack = scanned["params"]["encoder"]["stack"]["layers"]

    def first_leaf(tree):
        return jax.tree_util.tree_leaves(tree)[0]

    np.testing.assert_array_equal(
        np.asarray(first_leaf(stack))[1], np.asarray(first_leaf(src_l1))
    )
    np.testing.assert_array_equal(
        np.asarray(first_leaf(stack))[0],
        np.asarray(first_leaf(tgt_stack))[0],
    )


def test_sequence_resume_across_scan_layouts(tmp_path):
    """ADVICE r2: scan_layers default flipped True in round 2 — an
    unrolled-layout sequence checkpoint must still resume into a scanned
    fresh state (params/batch_stats converted; optimizer restarts)."""
    import dataclasses
    import warnings

    from indic_cl_asr_tpu.models.hybrid import init_model, tiny_config
    from indic_cl_asr_tpu.train.state import create_train_state, make_optimizer
    from indic_cl_asr_tpu.utils.pytree import conformer_freeze_mask

    base = tiny_config()
    unrolled_cfg = dataclasses.replace(
        base, encoder=dataclasses.replace(base.encoder, scan_layers=False)
    )
    scanned_cfg = dataclasses.replace(
        base, encoder=dataclasses.replace(base.encoder, scan_layers=True)
    )
    _, old_vars = init_model(unrolled_cfg, jax.random.PRNGKey(0))
    mask = conformer_freeze_mask(old_vars["params"], 0)
    tx_old = make_optimizer(lr=1e-3, trainable_mask=mask)
    old_state = create_train_state(old_vars, tx_old)
    old_state = old_state.replace(step=jnp.asarray(5, jnp.int32))

    ckpt = SequenceCheckpointer(str(tmp_path / "seq"))
    ckpt.save_task(0, "hindi", old_state, {"hindi": [{"rnnt_wer": 0.4}]})

    _, fresh_vars = init_model(scanned_cfg, jax.random.PRNGKey(1))
    mask2 = conformer_freeze_mask(fresh_vars["params"], 0)
    tx_new = make_optimizer(
        lr=1e-3, trainable_mask=mask2, stacked_freeze_till=0
    )
    fresh = create_train_state(fresh_vars, tx_new)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        restored = ckpt.load_task(0, "hindi", fresh)

    assert int(restored.step) == 5
    # layer 1 weights of the unrolled save land in stacked row 1
    got = jax.tree_util.tree_leaves(
        restored.params["encoder"]["stack"]["layers"]
    )[0]
    want = jax.tree_util.tree_leaves(
        old_state.params["encoder"]["layers_1"]
    )[0]
    np.testing.assert_array_equal(np.asarray(got)[1], np.asarray(want))
