"""Driver entry-point checks on the virtual CPU mesh."""

import numpy as np
import jax


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 34, 27)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)  # raises on failure
