"""Driver-level SPMD training: `--mesh.data/--mesh.model` must run the
SAME experiment the single-device path runs — per-step numerics within
sharding tolerance, end-to-end through scripts/cl_*.py.

This is the user-facing counterpart of tests/test_train_step.py's
step-level mesh==single-device parity: it proves the mesh plumbing
(config -> build_all -> run_sequence -> place_batch/shard_train_state)
composes with batching, eval, checkpointing and the CL importance
epoch. Replaces the reference's DDP launch path
(cl_baseline.py:33-48,133-134) with GSPMD over a 2x2 virtual-CPU mesh."""

import json
import os
import sys

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
sys.path.insert(0, SCRIPTS)

from tests.test_scripts import DRIVER_ARGS  # noqa: E402


def _train_loss_series(out_dir):
    """All train/train_loss_* values, in log order, from every run under
    out_dir."""
    series = []
    for root, _, files in os.walk(out_dir):
        for f in sorted(files):
            if f != "metrics.jsonl":
                continue
            with open(os.path.join(root, f)) as fh:
                for line in fh:
                    rec = json.loads(line)
                    for k, v in rec.items():
                        if k.startswith("train/train_loss_"):
                            series.append(float(v))
    return np.asarray(series)


def test_place_batch_multihost_branch_matches_device_put(monkeypatch, rng):
    """The multi-process branch of place_batch (every host assembles the
    identical global batch, `make_array_from_callback` takes this
    process's rows) must produce arrays with the same sharding and
    contents as the single-controller device_put branch. Forced here by
    patching process_count on a single-host mesh, where both branches
    are well-defined."""
    import jax
    import jax.numpy as jnp

    from indic_cl_asr_tpu.parallel import sharding as sh

    mesh = sh.make_mesh(n_data=4, n_model=2)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((8, 64)), jnp.float32),
        "audio_len": jnp.full((8,), 64, jnp.int32),
        "n_valid": jnp.asarray(8, jnp.int32),  # 0-d: must replicate
    }
    placed1 = sh.place_batch(batch, mesh)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    placed2 = sh.place_batch(batch, mesh)
    for k in batch:
        assert placed1[k].sharding == placed2[k].sharding, k
        np.testing.assert_array_equal(
            np.asarray(placed1[k]), np.asarray(placed2[k])
        )
    assert placed1["n_valid"].sharding.spec == jax.sharding.PartitionSpec()


@pytest.mark.slow
@pytest.mark.parametrize("driver", ["cl_baseline", "cl_ewc", "cl_lwf"])
def test_mesh_driver_matches_single_device(tmp_path, driver):
    mod = __import__(driver)

    out1 = str(tmp_path / "single")
    res1 = mod.main(DRIVER_ARGS + ["--output_dir", out1, "--notes", "t"])

    out2 = str(tmp_path / "mesh")
    res2 = mod.main(DRIVER_ARGS + [
        "--output_dir", out2, "--notes", "t",
        "--mesh.data", "2", "--mesh.model", "2",
    ])

    # identical experiment shape
    assert list(res1["val"].keys()) == list(res2["val"].keys())
    for lang in res1["val"]:
        assert len(res1["val"][lang]) == len(res2["val"][lang])
        for r1, r2 in zip(res1["val"][lang], res2["val"][lang]):
            assert set(r1) == set(r2)
            for k in r1:
                assert np.isfinite(r2[k]), (lang, k, r2[k])

    # per-step training losses track the single-device run within
    # sharding tolerance (step-level parity is rtol 2e-4; allow drift
    # accumulated over the epoch)
    s1 = _train_loss_series(out1)
    s2 = _train_loss_series(out2)
    assert s1.size == s2.size and s1.size > 0
    np.testing.assert_allclose(s1, s2, rtol=2e-2)
