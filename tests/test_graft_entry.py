"""Driver-contract regression tests: entry() compiles and runs; the multichip
dryrun executes a full dp x tp ZeRO-1 train step on the virtual mesh."""

import numpy as np

import jax


def test_entry_compiles_and_runs():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (8, 512)
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-3)


def test_dryrun_multichip_8(devices):
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
