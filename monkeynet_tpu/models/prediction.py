"""GRU keypoint-trajectory predictor (image-to-video mode).

Semantics mirror the reference PredictionModule (modules/prediction_module.py:
5-44): flattened kp state per frame -> (stacked) GRU -> linear head; the mean
goes through tanh; the covariance is re-formed PSD as V^T V.

The recurrence is a `lax.scan` over the frame axis (XLA-compiled, static
shapes) instead of cuDNN GRU. Gate math and parameter layout follow torch's
GRU exactly (gates ordered [reset, update, new], separate input/hidden
biases), so published torch checkpoints import directly.
"""

from __future__ import annotations

import math
from typing import Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform_init(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchGRULayer(nn.Module):
    """One GRU layer with torch-exact gate equations, scanned over time.

    h' = (1-z) * n + z * h, with
      r = sigmoid(x W_ir^T + b_ir + h W_hr^T + b_hr)
      z = sigmoid(x W_iz^T + b_iz + h W_hz^T + b_hz)
      n = tanh   (x W_in^T + b_in + r * (h W_hn^T + b_hn))

    Parameters are stored in torch layout: weight_ih (3H, in),
    weight_hh (3H, H), bias_ih (3H,), bias_hh (3H,).
    """

    hidden: int

    @nn.compact
    def __call__(self, xs):
        """xs: (B, T, in) -> (B, T, hidden)."""
        B, T, in_dim = xs.shape
        H = self.hidden
        bound = 1.0 / math.sqrt(H)
        w_ih = self.param("weight_ih", _uniform_init(bound), (3 * H, in_dim))
        w_hh = self.param("weight_hh", _uniform_init(bound), (3 * H, H))
        b_ih = self.param("bias_ih", _uniform_init(bound), (3 * H,))
        b_hh = self.param("bias_hh", _uniform_init(bound), (3 * H,))

        # Precompute all input projections in one large matmul (MXU-friendly).
        x_proj = xs @ w_ih.T + b_ih  # (B, T, 3H)

        def step(h, x_t):
            h_proj = h @ w_hh.T  # (B, 3H)
            xr, xz, xn = jnp.split(x_t, 3, axis=-1)
            hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
            br, bz, bn = jnp.split(b_hh, 3)
            r = jax.nn.sigmoid(xr + hr + br)
            z = jax.nn.sigmoid(xz + hz + bz)
            n = jnp.tanh(xn + r * (hn + bn))
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        h0 = jnp.zeros((B, H), xs.dtype)
        _, hs = jax.lax.scan(step, h0, jnp.swapaxes(x_proj, 0, 1))
        return jnp.swapaxes(hs, 0, 1)  # (B, T, H)


class KeypointPredictor(nn.Module):
    num_kp: int = 10
    kp_variance: Union[str, float] = 0.01
    num_features: int = 1024
    num_layers: int = 1
    dropout: float = 0.5

    @nn.compact
    def __call__(self, kp_batch, train: bool = False):
        """kp_batch: {'mean': (B, D, K, 2)[, 'var': (B, D, K, 2, 2)]}."""
        B, D, K, _ = kp_batch["mean"].shape
        inputs = [kp_batch["mean"].reshape(B, D, -1)]
        has_var = "var" in kp_batch
        if has_var:
            inputs.append(kp_batch["var"].reshape(B, D, -1))
        x = jnp.concatenate(inputs, axis=-1)
        out_dim = x.shape[-1]

        for layer in range(self.num_layers):
            x = TorchGRULayer(self.num_features, name=f"gru{layer}")(x)
            if self.dropout > 0 and layer < self.num_layers - 1:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)

        bound = 1.0 / math.sqrt(self.num_features)
        x = nn.Dense(
            out_dim,
            kernel_init=_uniform_init(bound),
            bias_init=_uniform_init(bound),
            name="head",
        )(x)

        x = x.reshape(B, D, K, -1)
        out = {"mean": jnp.tanh(x[..., :2])}
        if has_var:
            v = x[..., 2:].reshape(B, D, K, 2, 2)
            out["var"] = jnp.swapaxes(v, -1, -2) @ v
        return out
