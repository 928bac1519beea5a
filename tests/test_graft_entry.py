"""Keep the driver entry points green: entry() compile-check and the
8-device dry run (the same paths the round driver exercises)."""

import jax
import numpy as np


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
    import __graft_entry__ as g
    g.dryrun_multichip(8)
