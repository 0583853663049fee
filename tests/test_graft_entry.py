"""The driver hooks in __graft_entry__ must work in a driver-like env.

Round-1 lesson (VERDICT.md "What's weak" #1): these were the only untested
entry points, and the untested one (dryrun_multichip) was the one that
failed.  conftest.py already provides the 8-virtual-CPU-device environment
the driver expects for the multichip dryrun.
"""

import jax
import pytest

import __graft_entry__ as graft


def test_entry_compiles_single_device():
    fn, args = graft.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    out = compiled(*args)
    assert out.shape == (4, 256, 256, 3)


@pytest.mark.parametrize("n_devices", [8])
def test_dryrun_multichip(n_devices, capsys):
    graft.dryrun_multichip(n_devices)
    assert "ok" in capsys.readouterr().out


def test_dryrun_multichip_subset_of_devices():
    # The driver may ask for fewer devices than the platform exposes; the
    # mesh must then use a subset, not fail.
    graft.dryrun_multichip(4)
