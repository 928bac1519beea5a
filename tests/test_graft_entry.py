"""Keep the driver entry points green: entry() compile-check and the
8-device dry run (the same paths the round driver exercises)."""

import os
import subprocess
import sys

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    state, image, mse = out
    assert image.shape[-1] == 3
    assert np.isfinite(np.asarray(image)).all()
    assert np.isfinite(float(mse))


def test_dryrun_multichip_8():
    # Run in a fresh subprocess, exactly like the driver does. Running it
    # in-process after ~20 other test files aborted fatally once in r1
    # (backend-state pollution / memory pressure took the whole pytest
    # process down); process isolation removes that failure mode and is
    # also the truer reproduction of the driver's invocation.
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, capture_output=True, text=True, timeout=1500,
        env={k: v for k, v in os.environ.items()
             if k not in ("JAX_PLATFORMS", "XLA_FLAGS")})
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
