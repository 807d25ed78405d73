"""Driver-contract regression tests: entry() compiles and runs; the multichip
dryrun executes a full dp x tp ZeRO-1 train step on the virtual mesh."""


import pytest

pytestmark = pytest.mark.slow  # see pyproject: fast tier = -m 'not slow'

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


def test_dryrun_multichip_self_provisions_like_driver():
    """Regression for MULTICHIP_r01 rc=1: the driver runs dryrun_multichip in
    a FRESH process whose env sees one device; the function must provision
    the virtual CPU backend itself. Reproduce that exactly via subprocess."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    # simulate the driver's default env: no CPU forcing, a non-CPU platform
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = env.get("JAX_PLATFORMS", "") or "cpu"
    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK on 8 devices" in out.stdout
