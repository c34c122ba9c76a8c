"""Driver-contract checks: the multichip dryrun runs on the virtual CPU
mesh, and entry() exposes a jittable flagship forward."""

import numpy as np

import jax


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on failure


def test_entry_traces():
    import __graft_entry__ as g

    fn, args = g.entry()
    out_shape = jax.eval_shape(fn, *args)
    # args = (params, x, sigma, cond); output matches the latent input x
    assert out_shape.shape == args[1].shape
    assert np.dtype(out_shape.dtype) == np.float32
