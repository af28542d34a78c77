"""Driver artifacts: __graft_entry__.entry() must jit-compile and
dryrun_multichip(8) must run a full sharded train step.

These are the exact calls the round driver makes; round 1's only red
artifact was dryrun_multichip, so they are CI-pinned now.  Under the test
env (conftest provisions 8 virtual CPU devices) the dryrun takes the
in-process path; the subprocess self-provisioning re-exec is exercised by
the driver itself on 1-device hosts.
"""

import numpy as np
import pytest

import jax

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, (params, batch) = graft.entry()
    pred, loss = jax.jit(fn)(params, batch)
    assert np.asarray(pred).shape == (4,)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    graft.dryrun_multichip(8)  # raises on failure


@pytest.mark.slow
def test_dryrun_multichip_16_devices():
    """16 > the conftest's 8 virtual devices, so this also exercises the
    subprocess self-provisioning re-exec path (plus the 8x2 dp-x-mp
    layout at a width the driver never requests itself)."""
    graft.dryrun_multichip(16)
