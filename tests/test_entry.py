"""Driver entry points: single-chip jit compile and multi-chip dry run."""

import sys

import jax
import numpy as np

sys.path.insert(0, ".")


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(jax.block_until_ready(out))
    assert out.shape == (128 * 128, 3)
    assert np.isfinite(out).all()


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
