"""Test assertion helpers (the framework's analog of the reference's vendored
sync_batchnorm/unittest.py assertTensorClose, for pytree-shaped outputs)."""

from __future__ import annotations

import numpy as np

import jax


def assert_trees_allclose(actual, desired, atol=1e-3, rtol=1e-3, err_prefix=""):
    """allclose over matching pytree leaves with a max-diff failure report."""
    actual_leaves, treedef_a = jax.tree.flatten(actual)
    desired_leaves, treedef_d = jax.tree.flatten(desired)
    assert treedef_a == treedef_d, f"{err_prefix}tree structure mismatch"
    for i, (a, d) in enumerate(zip(actual_leaves, desired_leaves)):
        a = np.asarray(a)
        d = np.asarray(d)
        if not np.allclose(a, d, atol=atol, rtol=rtol):
            adiff = np.abs(a - d)
            rdiff = adiff / (np.abs(d) + 1e-12)
            raise AssertionError(
                f"{err_prefix}leaf {i}: max abs diff {adiff.max():.3e}, "
                f"max rel diff {rdiff.max():.3e} (atol={atol}, rtol={rtol})"
            )
