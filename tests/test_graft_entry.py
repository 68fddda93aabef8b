"""Driver-contract tests: __graft_entry__ must compile-check and the
multichip dryrun must run one fully-sharded train step on the virtual mesh."""

import sys

import jax
import numpy as np


def test_dryrun_multichip_8():
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss + step increment internally


def test_entry_returns_jittable():
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    fn, args = g.entry()
    joint, ctc, enc_lens = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(ctc)).all()
    assert joint.shape[0] == 2 and joint.shape[-1] == 257
