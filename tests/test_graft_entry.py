"""Driver contract: entry() jit-compiles; dryrun_multichip runs on the
virtual mesh (what the round driver executes)."""

import sys

import numpy as np
import pytest

import jax


sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    x, a = jax.block_until_ready(out)
    assert x.shape == (8192,)
    assert a.shape == (8192,)
    # variable draws uniform over 2^20
    assert int(np.asarray(x).min()) >= 0
    assert int(np.asarray(x).max()) < (1 << 20)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_dryrun_multichip(n_devices):
    import __graft_entry__ as g

    g.dryrun_multichip(n_devices)  # asserts finite loss internally


def test_dryrun_rejects_missing_devices():
    import __graft_entry__ as g

    with pytest.raises(RuntimeError):
        g.dryrun_multichip(64)
