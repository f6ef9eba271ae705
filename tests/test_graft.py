"""The driver entry points must keep compiling and running."""

import os
import sys

import jax
import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.shape == args[0].shape
    assert float(jax.numpy.max(jax.numpy.abs(out))) < 10.0


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
