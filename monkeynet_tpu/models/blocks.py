"""NN building blocks, channels-last (NDHWC), flax.linen.

TPU-first design choices vs the reference (modules/util.py:45-203,
sync_batchnorm/*):

  * Layout is NDHWC; spatial-only (1, k, k) "3D" convs are computed as 2D
    convs with the frame dim folded into batch — identical math, and XLA maps
    the resulting large NHWC convs straight onto the MXU instead of treating
    them as thin depth-1 3D convolutions.
  * Cross-replica batch norm is a single `lax.psum` of (sum, sum-of-squares,
    count) over the data-parallel mesh axis — this replaces the reference's
    ~550-line thread-rendezvous sync-BN package (sync_batchnorm/batchnorm.py,
    comm.py, replicate.py) with two collectives that XLA schedules over ICI.
    The statistics computed are mathematically identical to the reference's
    master-reduce (`_compute_mean_std`, sync_batchnorm/batchnorm.py:113-125):
    biased variance for normalization, unbiased for the running estimate.
  * Parameter init reproduces torch's Conv/Linear defaults (kaiming-uniform
    with a=sqrt(5), i.e. U(+-1/sqrt(fan_in)) for both kernel and bias) so our
    from-scratch training dynamics match the reference's.

Block semantics mirror modules/util.py: DownBlock (conv-BN-relu-avgpool),
UpBlock (x2 nearest upsample-conv-BN-relu), SameBlock (grouped conv-BN-relu),
ResBlock (BN-relu-conv twice, residual), Encoder (returns every scale),
Decoder (skip-concat U-Net), Hourglass (Encoder o Decoder).
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from monkeynet_tpu.ops.sampling import resize_nearest

Dtype = Any

# torch Conv default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _BlockDiagConv2D(nn.Module):
    """Grouped 1x1/kxk conv computed as ONE dense conv with a block-diagonal
    kernel.

    `feature_group_count` lowers to per-group thin convolutions on TPU (the
    dense-motion group blocks are K+1 = 11 groups of 4 channels — measured
    ~3x slower than a dense 44-channel conv in the fused train step). The
    parameter keeps the torch/flax grouped shape (kh, kw, Cin/G, Cout) — the
    pytree, init fans, and checkpoint format are unchanged — and is scattered
    into a block-diagonal (kh, kw, Cin, Cout) kernel at apply time. The
    off-diagonal zeros are constants, so gradients stay confined to the
    blocks exactly as in the grouped form.
    """

    features: int
    groups: int
    kernel_hw: Tuple[int, int]
    padding_hw: Any
    use_bias: bool
    dtype: Optional[Dtype]
    kernel_init: Any
    bias_init: Any

    @nn.compact
    def __call__(self, x):  # x: (N, H, W, Cin)
        kh, kw = self.kernel_hw
        cin = x.shape[-1]
        if cin % self.groups or self.features % self.groups:
            raise ValueError(
                f"grouped conv: in_channels {cin} and features "
                f"{self.features} must both be divisible by groups "
                f"{self.groups}"
            )
        ci, co = cin // self.groups, self.features // self.groups
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, ci, self.features)
        )
        dense = jnp.zeros((kh, kw, cin, self.features), kernel.dtype)
        for g in range(self.groups):
            dense = dense.at[
                :, :, g * ci : (g + 1) * ci, g * co : (g + 1) * co
            ].set(kernel[:, :, :, g * co : (g + 1) * co])
        if self.dtype is not None:
            x = x.astype(self.dtype)
            dense = dense.astype(self.dtype)
        else:
            # Match nn.Conv's promote_dtype semantics: a bf16 input meeting
            # f32 params runs the conv at the promoted (f32) dtype instead of
            # handing lax mismatched operands.
            common = jnp.promote_types(x.dtype, dense.dtype)
            x, dense = x.astype(common), dense.astype(common)
        y = jax.lax.conv_general_dilated(
            x, dense, (1, 1), self.padding_hw,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class _PhaseUpConv2D(nn.Module):
    """3x3 conv on a nearest-2x-upsampled input WITHOUT materializing the
    upsample.

    Uses the transposed-conv identity: nearest-2x is zero-insertion convolved
    with a 2x2 box, so `conv3x3(nearest2(x)) == conv(x, T @ k @ T^T,
    lhs_dilation=2, pad 2)` where T = [[1,0,0],[1,1,0],[0,1,1],[0,0,1]] forms
    the 4 row/column tap-sums (even output rows see taps (w0 | w1+w2), odd
    rows (w0+w1 | w2), same for columns). One lhs-dilated conv lets XLA's
    convolution emitter own the phase bookkeeping — an explicit
    phase-blocks + depth-to-space formulation was measured SLOWER than the
    materialized upsample (the full-res interleave relayout cost more than
    the 2.25x conv-FLOP saving; see log_r5/trace_ops_taichi_b32_*.json).

    The parameter keeps the (3, 3, Cin, Cout) shape/init of the plain conv —
    pytree, fan-in, and checkpoint/torch-import format are unchanged; tap
    sums are formed in f32 at apply time. Exactly equivalent (up to float
    summation order) to `resize_nearest(x, 2x) |> conv3x3 SAME`, including
    zero-padding at the borders (tested in tests/test_blocks.py).
    """

    features: int
    use_bias: bool
    dtype: Optional[Dtype]
    kernel_init: Any
    bias_init: Any

    @nn.compact
    def __call__(self, x):  # (N, H, W, Cin) -> (N, 2H, 2W, Cout)
        cin = x.shape[-1]
        co = self.features
        kernel = self.param("kernel", self.kernel_init, (3, 3, cin, co))
        w = kernel.astype(jnp.float32)
        tap_sum = jnp.asarray(
            [[1, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]], dtype=jnp.float32
        )
        k4 = jnp.einsum("ua,vb,abio->uvio", tap_sum, tap_sum, w)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            k4 = k4.astype(self.dtype)
        else:
            common = jnp.promote_types(x.dtype, kernel.dtype)
            x, k4 = x.astype(common), k4.astype(common)
        out = jax.lax.conv_general_dilated(
            x, k4, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (N, 2H, 2W, co)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (co,))
            out = out + bias.astype(out.dtype)
        return out


def _fused_upconv_enabled() -> bool:
    """Env kill-switch for the fused lhs-dilated UpBlock conv
    (MONKEYNET_FUSED_UPCONV=0 restores the materialized upsample+conv).
    Read at trace time; the two paths are value/gradient-equivalent and
    share one param tree, so flipping it never invalidates a checkpoint.
    bench.py uses the off-path to count the MODEL-formulation FLOPs."""
    return os.environ.get("MONKEYNET_FUSED_UPCONV", "1") != "0"


class _UpsampleConv3D(nn.Module):
    """nearest-2x upsample + spatial (1,3,3) SAME conv over (B,D,H,W,C),
    fused via _PhaseUpConv2D. Param tree matches Conv3D(name='conv') so
    UpBlock checkpoints are unchanged."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        fan_in = C * 9
        y = _PhaseUpConv2D(
            self.features,
            self.use_bias,
            self.dtype,
            torch_kernel_init,
            torch_bias_init(fan_in),
            name="conv",
        )(x.reshape(B * D, H, W, C))
        return y.reshape(B, D, 2 * H, 2 * W, self.features)


class Conv3D(nn.Module):
    """Conv over (B, D, H, W, C) with torch-default init.

    Spatial-only kernels (depth 1) fold D into batch and run as 2D convs;
    temporal kernels run as true 3D convs. `groups` is torch-style grouped
    convolution (feature_group_count).
    """

    features: int
    kernel_size: Tuple[int, int, int] = (1, 3, 3)
    padding: Tuple[int, int, int] = (0, 1, 1)
    groups: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    kernel_init: Optional[Any] = None
    bias_init: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        pt, ph, pw = self.padding
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * kt * kh * kw
        kernel_init = self.kernel_init or torch_kernel_init
        bias_init = self.bias_init or torch_bias_init(fan_in)

        if kt == 1:
            if pt != 0:
                raise ValueError("depth-1 kernel with temporal padding")
            B, D, H, W, C = x.shape
            if self.groups > 1:
                y = _BlockDiagConv2D(
                    self.features,
                    self.groups,
                    (kh, kw),
                    ((ph, ph), (pw, pw)),
                    self.use_bias,
                    self.dtype,
                    kernel_init,
                    bias_init,
                    name="conv",
                )(x.reshape(B * D, H, W, C))
            else:
                y = nn.Conv(
                    self.features,
                    (kh, kw),
                    padding=((ph, ph), (pw, pw)),
                    use_bias=self.use_bias,
                    kernel_init=kernel_init,
                    bias_init=bias_init,
                    dtype=self.dtype,
                    name="conv",
                )(x.reshape(B * D, H, W, C))
            return y.reshape(B, D, y.shape[1], y.shape[2], self.features)

        return nn.Conv(
            self.features,
            (kt, kh, kw),
            padding=((pt, pt), (ph, ph), (pw, pw)),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            name="conv",
        )(x)


class SyncBatchNorm(nn.Module):
    """Batch norm with optional cross-replica stats via `lax.psum`.

    Equivalent to the reference's SynchronizedBatchNorm3d: training-mode
    statistics are computed over the GLOBAL batch (psum of sum/ssum/count
    over `axis_name` when set — the ICI replacement for
    sync_batchnorm/comm.py's thread rendezvous); running stats use the
    unbiased variance (sync_batchnorm/batchnorm.py:113-125). Momentum follows
    the torch convention: running = (1 - m) * running + m * batch.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if train:
            red_axes = tuple(range(x.ndim - 1))
            local_count = float(np.prod([x.shape[a] for a in red_axes]))
            xf = x.astype(jnp.float32)
            s = jnp.sum(xf, axis=red_axes)
            ss = jnp.sum(xf * xf, axis=red_axes)
            cnt = jnp.asarray(local_count, jnp.float32)
            if self.axis_name is not None:
                s, ss, cnt = jax.lax.psum((s, ss, cnt), axis_name=self.axis_name)
            mean = s / cnt
            var = jnp.maximum(ss / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * (cnt / jnp.maximum(cnt - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps)
        y = (x - mean.astype(x.dtype)) * (inv * scale).astype(x.dtype)
        return y + bias.astype(x.dtype)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over (D, H, W), affine.

    Matches torch InstanceNorm3d(affine=True) as the discriminator uses it
    (modules/discriminator.py:20): biased variance, eps 1e-5, no running
    stats.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        red = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=red, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=red, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


def avg_pool_2x2(x):
    """(1, 2, 2) average pooling over (B, D, H, W, C).

    Floor mode (torch AvgPool3d default): trailing odd row/col is dropped —
    the discriminator's VALID convs produce odd spatial sizes.
    """
    B, D, H, W, C = x.shape
    H2, W2 = H // 2, W // 2
    x = x[:, :, : 2 * H2, : 2 * W2]
    x = x.reshape(B, D, H2, 2, W2, 2, C)
    return x.mean(axis=(3, 5))


class DownBlock(nn.Module):
    """conv -> BN -> relu -> (1,2,2) avg-pool (encoder step)."""

    features: int
    kernel_size: Tuple[int, int, int] = (1, 3, 3)
    padding: Tuple[int, int, int] = (0, 1, 1)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv3D(self.features, self.kernel_size, self.padding, name="conv")(x)
        x = SyncBatchNorm(self.features, axis_name=self.axis_name, name="norm")(x, train)
        x = nn.relu(x)
        return avg_pool_2x2(x)


class UpBlock(nn.Module):
    """x2 nearest upsample -> conv -> BN -> relu (decoder step)."""

    features: int
    kernel_size: Tuple[int, int, int] = (1, 3, 3)
    padding: Tuple[int, int, int] = (0, 1, 1)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        if (
            self.kernel_size == (1, 3, 3)
            and self.padding == (0, 1, 1)
            and _fused_upconv_enabled()
        ):
            # Fused lhs-dilated path: identical math and identical param
            # tree, never materializes the 2x-upsampled activation.
            x = _UpsampleConv3D(self.features, name="conv")(x)
        else:
            H, W = x.shape[-3], x.shape[-2]
            x = resize_nearest(x, (2 * H, 2 * W))
            x = Conv3D(self.features, self.kernel_size, self.padding, name="conv")(x)
        x = SyncBatchNorm(self.features, axis_name=self.axis_name, name="norm")(x, train)
        return nn.relu(x)


class SameBlock(nn.Module):
    """(grouped) conv -> BN -> relu, resolution-preserving."""

    features: int
    groups: int = 1
    kernel_size: Tuple[int, int, int] = (1, 3, 3)
    padding: Tuple[int, int, int] = (0, 1, 1)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv3D(
            self.features, self.kernel_size, self.padding, groups=self.groups,
            name="conv",
        )(x)
        x = SyncBatchNorm(self.features, axis_name=self.axis_name, name="norm")(x, train)
        return nn.relu(x)


class ResBlock(nn.Module):
    """Pre-activation residual block: (BN-relu-conv) x2 + skip."""

    features: int
    kernel_size: Tuple[int, int, int] = (1, 3, 3)
    padding: Tuple[int, int, int] = (0, 1, 1)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        out = SyncBatchNorm(self.features, axis_name=self.axis_name, name="norm1")(
            x, train
        )
        out = nn.relu(out)
        out = Conv3D(self.features, self.kernel_size, self.padding, name="conv1")(out)
        out = SyncBatchNorm(self.features, axis_name=self.axis_name, name="norm2")(
            out, train
        )
        out = nn.relu(out)
        out = Conv3D(self.features, self.kernel_size, self.padding, name="conv2")(out)
        return out + x


def _hourglass_channels(block_expansion: int, num_blocks: int, max_features: int):
    """Per-scale channel counts: scale i (after i+1 downsamples) has
    min(max_features, block_expansion * 2^(i+1)) channels."""
    return [
        min(max_features, block_expansion * (2 ** (i + 1))) for i in range(num_blocks)
    ]


class Encoder(nn.Module):
    """Stack of DownBlocks; returns ALL intermediate maps [x, f1, ..., fn]."""

    block_expansion: int
    num_blocks: int = 3
    max_features: int = 256
    temporal: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        ks = (3, 3, 3) if self.temporal else (1, 3, 3)
        pad = (1, 1, 1) if self.temporal else (0, 1, 1)
        chans = _hourglass_channels(
            self.block_expansion, self.num_blocks, self.max_features
        )
        outs = [x]
        for i, ch in enumerate(chans):
            outs.append(
                DownBlock(
                    ch,
                    kernel_size=ks,
                    padding=pad,
                    axis_name=self.axis_name,
                    name=f"down{i}",
                )(outs[-1], train)
            )
        return outs


class Decoder(nn.Module):
    """U-Net decoder consuming the Encoder's skip list.

    Each UpBlock output is concatenated with the matching skip; when
    `additional_features` maps are supplied (generator kp-embedding path)
    they are pre-concatenated onto every skip INCLUDING the bottleneck by the
    caller. `use_last_conv=False` returns the final concat for external
    refinement heads.
    """

    block_expansion: int
    out_features: int = 3
    num_blocks: int = 3
    max_features: int = 256
    temporal: bool = False
    use_last_conv: bool = True
    axis_name: Optional[str] = None
    final_kernel_init: Optional[Any] = None
    final_bias_init: Optional[Any] = None

    @nn.compact
    def __call__(self, skips: Sequence[jax.Array], train: bool):
        ks = (3, 3, 3) if self.temporal else (1, 3, 3)
        pad = (1, 1, 1) if self.temporal else (0, 1, 1)
        skips = list(skips)
        out = skips.pop()
        for i in range(self.num_blocks - 1, -1, -1):
            ch = min(self.max_features, self.block_expansion * (2**i))
            out = UpBlock(
                ch, kernel_size=ks, padding=pad, axis_name=self.axis_name,
                name=f"up{self.num_blocks - 1 - i}",
            )(out, train)
            out = jnp.concatenate([out, skips.pop()], axis=-1)
        if self.use_last_conv:
            out = Conv3D(
                self.out_features,
                ks,
                pad,
                kernel_init=self.final_kernel_init,
                bias_init=self.final_bias_init,
                name="final_conv",
            )(out)
        return out


class Hourglass(nn.Module):
    """Encoder followed by Decoder (keypoint / dense-motion predictor body)."""

    block_expansion: int
    out_features: int
    num_blocks: int = 3
    max_features: int = 256
    temporal: bool = False
    axis_name: Optional[str] = None
    final_kernel_init: Optional[Any] = None
    final_bias_init: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        skips = Encoder(
            self.block_expansion,
            num_blocks=self.num_blocks,
            max_features=self.max_features,
            temporal=self.temporal,
            axis_name=self.axis_name,
            name="encoder",
        )(x, train)
        return Decoder(
            self.block_expansion,
            out_features=self.out_features,
            num_blocks=self.num_blocks,
            max_features=self.max_features,
            temporal=self.temporal,
            use_last_conv=True,
            axis_name=self.axis_name,
            final_kernel_init=self.final_kernel_init,
            final_bias_init=self.final_bias_init,
            name="decoder",
        )(skips, train)
