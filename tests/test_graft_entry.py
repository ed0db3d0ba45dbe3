"""The driver entry points must stay runnable: a jittable single-chip
step and the multi-device dryrun (CPU mesh)."""

import sys

import jax
import numpy as np
import pytest


def test_entry_and_dryrun():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out).shape[1] >= 10
    if len(jax.local_devices(backend="cpu")) < 4:
        pytest.skip("needs multi-device CPU mesh")
    ge.dryrun_multichip(4)
