"""Unit tests for blocks.py edge cases (ADVICE round 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monkeynet_tpu.models.blocks import Conv3D


def test_grouped_conv_rejects_indivisible_channels():
    # 10 in-channels over 3 groups: floor division would silently drop the
    # trailing input channel; must raise instead (flax nn.Conv parity).
    m = Conv3D(features=9, kernel_size=(1, 1, 1), padding=(0, 0, 0), groups=3)
    x = jnp.ones((2, 1, 4, 4, 10))
    with pytest.raises(ValueError, match="divisible by groups"):
        m.init(jax.random.PRNGKey(0), x)

    m2 = Conv3D(features=10, kernel_size=(1, 1, 1), padding=(0, 0, 0), groups=3)
    x2 = jnp.ones((2, 1, 4, 4, 9))
    with pytest.raises(ValueError, match="divisible by groups"):
        m2.init(jax.random.PRNGKey(0), x2)


def test_grouped_conv_promotes_bf16_input_like_nn_conv():
    # dtype=None + bf16 input + f32 params: must promote (like
    # flax.linen.Conv) instead of raising a lax dtype-mismatch error.
    m = Conv3D(features=8, kernel_size=(1, 3, 3), padding=(0, 1, 1), groups=2)
    x32 = jnp.asarray(np.random.RandomState(0).rand(2, 1, 4, 4, 8), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x32)
    y16 = m.apply(variables, x32.astype(jnp.bfloat16))
    assert y16.dtype == jnp.float32  # promoted to param dtype
    y32 = m.apply(variables, x32)
    np.testing.assert_allclose(
        np.asarray(y16), np.asarray(y32), rtol=0, atol=0.05
    )
