"""Driver-contract tests: __graft_entry__ must compile-check and the
multichip dryrun must run one fully-sharded train step on the virtual mesh."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_contract_fresh_process():
    """The driver calls dryrun_multichip in an environment WITHOUT the test
    harness's device forcing (VERDICT r1 item 1: MULTICHIP_r01 failed because
    the entry point relied on conftest). Run it in a pristine subprocess —
    no XLA_FLAGS, no JAX_PLATFORMS — and require success."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, '.');"
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert r.returncode == 0, f"stderr:\n{r.stderr[-2000:]}"
    assert "dryrun_multichip OK" in r.stdout


@pytest.mark.slow
def test_dryrun_multichip_8():
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss + step increment internally


@pytest.mark.slow
def test_entry_returns_jittable():
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    fn, args = g.entry()
    joint, ctc, enc_lens = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(ctc)).all()
    assert joint.shape[0] == 2 and joint.shape[-1] == 257
