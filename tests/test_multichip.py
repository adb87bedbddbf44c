"""Multi-chip sharding stays green in CI: the driver's dryrun path (DP
train step + population-sharded fitting over an 8-device virtual mesh)
run as a regular test."""

import jax
import pytest


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert float(out[0]) > 0
