"""The driver's entry points must stay green: jittable forward + 8-device
multi-chip dry run — including the subprocess fallback the real driver hits
when the ambient backend can't provide n devices."""

import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 2, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_4():
    import __graft_entry__ as g

    g.dryrun_multichip(4)


def test_dryrun_multichip_reexecs_when_too_few_devices():
    """16 > the 8 virtual devices here, so this must take the subprocess
    path (forced 16-device virtual CPU mesh) and still succeed — the exact
    scenario the driver hits on a 1-TPU host."""
    import __graft_entry__ as g

    assert g._ambient_devices() == 8
    g.dryrun_multichip(16)


def test_make_mesh_raises_instead_of_truncating():
    from monkeynet_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="16-device mesh"):
        make_mesh(16)
    mesh = make_mesh(8)
    assert mesh.size == 8
