"""Reusable model layers (flax.linen), TPU-native NHWC.

Re-designs of the reference layer library ``p2igan_bench/modules/layer.py``.
Activations are channel-last (B, H, W, C); the channel axis preserves the
reference's torch channel ordering (C = c*t interleavings, grouped convs,
repeat-interleave duplication) so checkpoints import 1:1.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .convs import (
    bilinear_upsample2x_align_corners,
    conv1d,
    conv2d,
    max_pool2d,
)
from .doconv import DOConv2d
from .idw import default_use_pallas


def kaiming_normal_fan_in(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(a=0, mode='fan_in') for HWIO kernels.

    (BaseNetwork.init_weights 'kaiming', reference layer.py:31-32.)
    """
    fan_in = int(np.prod(shape[:-1]))
    std = np.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


class Conv2dTorch(nn.Module):
    """Plain conv2d with torch-compatible init and NHWC layout."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = kaiming_normal_fan_in

    @nn.compact
    def __call__(self, x: jax.Array, post_scale: jax.Array | None = None) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init,
            (k, k, self.in_channels // self.groups, self.out_channels),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,)) \
            if self.use_bias else None
        if post_scale is not None:
            # conv(x) * post_scale + bias, scale applied BETWEEN matmul and
            # bias so a per-pixel gate commuted through the conv (UPPos
            # fold_gate) lands in the conv's epilogue fusion
            y = conv2d(x, kernel.astype(x.dtype), stride=self.stride,
                       padding=self.padding, groups=self.groups, bias=None)
            y = y * post_scale
            return y if bias is None else y + bias.astype(y.dtype)
        return conv2d(x, kernel.astype(x.dtype), stride=self.stride,
                      padding=self.padding, groups=self.groups,
                      bias=None if bias is None else bias.astype(x.dtype))


class BasicConv(nn.Module):
    """Plain conv -> (norm) -> (relu) with optional transpose
    (reference BasicConv, layer.py:43-65). Channel-last; BatchNorm carries a
    ``batch_stats`` collection when ``norm=True``."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = False
    norm: bool = False
    relu: bool = True
    transpose: bool = False
    groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        use_bias = self.use_bias and not self.norm
        k = self.kernel_size
        if self.transpose:
            from .convs import conv_transpose2d

            if self.groups != 1:
                # conv_transpose2d has no grouped support; a dense transposed
                # conv would silently compute different math than requested
                raise NotImplementedError(
                    "BasicConv(transpose=True) does not support groups != 1")
            pad = k // 2 - 1
            kernel = self.param("kernel", kaiming_normal_fan_in,
                                (k, k, self.out_channels, self.in_channels))
            bias = self.param("bias", nn.initializers.zeros,
                              (self.out_channels,)) if use_bias else None
            x = conv_transpose2d(x, kernel.astype(x.dtype), stride=self.stride,
                                 padding=pad,
                                 bias=None if bias is None else bias.astype(x.dtype))
        else:
            x = Conv2dTorch(self.in_channels, self.out_channels, k,
                            stride=self.stride, padding=k // 2,
                            groups=self.groups, use_bias=use_bias,
                            name="conv")(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn")(x)
        if self.relu:
            x = jax.nn.relu(x)
        return x


class BasicConvDO(nn.Module):
    """DO-Conv -> (optional ReLU). Reference BasicConv_do (layer.py:68-94).

    ``factored=False`` gives the _eval variant (folded plain kernel).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    relu: bool = True
    groups: int = 1
    factored: bool = True
    fuse_repeat_skip: bool = False  # eval-only, see DOConv2d
    dense_groups: bool = False      # train+eval, autodiff-safe; see DOConv2d

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.kernel_size // 2
        x = DOConv2d(
            self.in_channels, self.out_channels, kernel_size=self.kernel_size,
            stride=self.stride, padding=pad, groups=self.groups,
            factored=self.factored, fuse_repeat_skip=self.fuse_repeat_skip,
            dense_groups=self.dense_groups,
            name="conv",
        )(x)
        if self.relu:
            x = jax.nn.relu(x)
        return x


class ResBlockDO(nn.Module):
    """Two 3x3 DO-convs with residual (reference ResBlock_do, layer.py:126-147)."""

    channels: int
    factored: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = BasicConvDO(self.channels, self.channels, 3, relu=True,
                        factored=self.factored, name="conv1")(x)
        y = BasicConvDO(self.channels, self.channels, 3, relu=False,
                        factored=self.factored, name="conv2")(y)
        return y + x


class ResBlockDOFFT(nn.Module):
    """Residual block with an rFFT2 spectral branch
    (reference ResBlock_do_fft_bench, layer.py:150-172; defined but disabled in
    P2IGenerator — provided for capability parity)."""

    channels: int
    factored: bool = True
    fft_groups: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        y = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="backward")
        y_f = jnp.concatenate([y.real, y.imag], axis=-1)
        y_f = BasicConvDO(2 * C, 2 * C, 1, relu=True, groups=self.fft_groups,
                          factored=self.factored, name="fft1")(y_f)
        y_f = BasicConvDO(2 * C, 2 * C, 1, relu=False, groups=self.fft_groups,
                          factored=self.factored, name="fft2")(y_f)
        y_re, y_im = jnp.split(y_f, 2, axis=-1)
        y = jnp.fft.irfft2(jax.lax.complex(y_re, y_im), s=(H, W), axes=(1, 2),
                           norm="backward").astype(x.dtype)
        z = BasicConvDO(C, C, 3, relu=True, factored=self.factored, name="conv1")(x)
        z = BasicConvDO(C, C, 3, relu=False, factored=self.factored, name="conv2")(z)
        return z + x + y


def downsample_duplicate_channels(x: jax.Array, length: int,
                                  use_pallas: Optional[bool] = None) -> jax.Array:
    """Maxpool-2 + per-frame channel duplication keeping the T grouping.

    Reference DownsampleDuplicateChannels (layer.py:200-214): channels are
    grouped as [t, c/t]; after pooling, each channel within a frame group is
    duplicated consecutively, doubling C. x: (B, H, W, C) with C % length == 0.
    Duplicating each channel consecutively == the reference's per-frame group
    duplication (groups are contiguous). On TPU a fused Pallas kernel does the
    pool + interleave-duplicate in one VMEM pass (ops/pallas/pool_dup.py).
    """
    B, H, W, C = x.shape
    if C % length != 0:
        raise ValueError(f"channels {C} must be divisible by {length}")
    use_pallas = default_use_pallas(use_pallas)
    if use_pallas and H % 2 == 0 and W % 2 == 0 and x.dtype == jnp.float32:
        from .pallas.pool_dup import maxpool2_duplicate

        return maxpool2_duplicate(x)
    x = max_pool2d(x, 2, 2)
    # concat formulation: 2.6x faster than jnp.repeat on a 5D view
    # (scripts/tune_infer.py, bit-equal outputs)
    x = x.reshape(B, H // 2, W // 2, C, 1)
    x = jnp.concatenate([x, x], axis=-1)
    return x.reshape(B, H // 2, W // 2, C * 2)


class LayerNorm2d(nn.Module):
    """GroupNorm(1, C) over (H, W, C) per sample (reference layer.py:217-223)."""

    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


class STABEDBlock(nn.Module):
    """norm->relu->conv + norm->conv fusion block (reference layer.py:226-240)."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        a = LayerNorm2d(self.cin, name="norm1")(x)
        a = Conv2dTorch(self.cin, self.cout, 3, padding=1, name="conv_double")(
            jax.nn.relu(a))
        b = LayerNorm2d(self.cin, name="norm2")(x)
        b = Conv2dTorch(self.cin, self.cout, 3, padding=1, name="conv_single")(b)
        return a + b


class AttentionBlock(nn.Module):
    """Per-position Conv1d(c, c, k=1) gating: relu(x + x * conv(x)).

    Reference layer.py:296-304. Operating on (N, L, C) channel-last; in the
    InputBlock, C is the temporal depth D and L == 1, so this is a per-pixel
    D x D linear gate.
    """

    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", kaiming_normal_fan_in, (1, self.channels, self.channels))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        gate = conv1d(x, kernel.astype(x.dtype), bias=bias.astype(x.dtype))
        return jax.nn.relu(x + x * gate)


class InputBlock(nn.Module):
    """Temporal attention + IDW k-NN densification (reference layer.py:307-361).

    Input/mask: (B, H, W, D) with D = C*T channel-last. The reference's
    per-pixel Conv1d stack is a batched (B*H*W, 1, D) gate — here a plain
    per-pixel matmul over D — and the per-sample nonzero+IDW Python loop
    becomes static-shape extract_points + vmap'd blocked IDW (ops/idw.py).
    Output: (B, H, W, D) densified field.
    """

    depth: int = 2
    k: int = 4
    rho: float = 2.0
    tau: float = 0.05
    chunk: int = 16384
    max_points: int = 2048
    use_pallas: Optional[bool] = None  # None = auto (TPU backend)
    factored: bool = False  # exact fast path for frame-constant masks (sti/stis)
    shared_batch_mask: bool = False  # all batch samples share one spatial mask
    frames: Optional[int] = None  # T for the gauge budget; None = channel depth
    # (max_points counts length*spatial points — from_config ignores C — so a
    # C>1 pipeline must pass frames=T or the budget under-sizes by C and the
    # static nonzero gather truncates; P2IGenerator passes its length)

    @staticmethod
    def gauge_budget(max_points: int, depth: int) -> int:
        """Static per-pixel gauge slot budget for the factored path."""
        return max(-(-max_points // max(depth, 1) // 128) * 128, 128)

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array,
                 prepared=None) -> jax.Array:
        from .idw import extract_points, idw_3d_knn

        B, H, W, D = x.shape

        if prepared is not None and not (self.factored and self.shared_batch_mask):
            # only the factored shared-mask path can consume a hoisted gauge
            # selection; silently dropping it would un-do the caller's
            # optimization (and hide a prepared table built for a different
            # configuration)
            raise ValueError(
                "InputBlock got `prepared` but factored+shared_batch_mask "
                f"is not set (factored={self.factored}, "
                f"shared_batch_mask={self.shared_batch_mask})")

        if self.factored:
            # mask is constant across frames: factorized exact k-NN. The
            # attention gate is per-pixel and the IDW only ever reads values
            # AT gauge pixels (reference layer.py:340-344 gathers values at
            # nonzero points), so gather the G gauge columns FIRST and run
            # attention on (B*G, D) instead of (B*H*W, D) — ~HW/G less work
            # and candidates then gather from a tiny (D, G) table.
            from .idw import (factored_apply_gauges,
                              factored_apply_gauges_batch,
                              factored_prepare_full)

            max_gauges = self.gauge_budget(self.max_points,
                                           self.frames or D)
            x_pix = x.reshape(B, H * W, D)

            if self.shared_batch_mask:
                # every sample shares one spatial mask (stis gauge files /
                # sliding windows of one event): the mask-derived gauge
                # selection is computed ONCE for the batch — or hoisted out
                # of the compiled program entirely via ``prepared``
                # (P2IGenerator.prepare_idw), since it is a constant of the
                # mask, not of the values
                if prepared is not None:
                    gd2, gsel, gauge_pix = prepared
                else:
                    gd2, gsel, gauge_pix = factored_prepare_full(
                        mask[0, :, :, 0], max_gauges, k=self.k)
                gvals = x_pix[:, gauge_pix, :]          # (B, G, D)
                gd2_b = gsel_b = None
            else:
                prep = jax.vmap(lambda m: factored_prepare_full(
                    m, max_gauges, k=self.k))(mask[:, :, :, 0])
                gd2_b, gsel_b, gauge_pix_b = prep
                gvals = jnp.take_along_axis(
                    x_pix, gauge_pix_b[:, :, None], axis=1)  # (B, G, D)

            G = gvals.shape[1]
            h = gvals.reshape(B * G, 1, D)
            for i in range(self.depth):
                h = AttentionBlock(D, name=f"att{i}")(h)
            vals_g = jnp.transpose(h.reshape(B, G, D),
                                   (0, 2, 1)).astype(jnp.float32)  # (B, D, G)

            if self.shared_batch_mask:
                # one selection pass for the whole batch (multi-window kernel)
                out = factored_apply_gauges_batch(
                    gd2, gsel, vals_g, out_hw=(H, W), k=self.k,
                    rho=self.rho, tau=self.tau, use_pallas=self.use_pallas)
            else:
                apply_one = functools.partial(factored_apply_gauges,
                                              out_hw=(H, W), k=self.k,
                                              rho=self.rho, tau=self.tau,
                                              use_pallas=self.use_pallas)
                out = jax.vmap(apply_one)(gd2_b, gsel_b, vals_g)
            return jnp.transpose(out, (0, 2, 3, 1))

        h = x.reshape(B * H * W, 1, D)
        for i in range(self.depth):
            h = AttentionBlock(D, name=f"att{i}")(h)
        h = h.reshape(B, H, W, D)

        # to (B, D, H, W) for the grid ordering (z=t major)
        vals_dhw = jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)
        mask_dhw = jnp.transpose(mask, (0, 3, 1, 2))

        use_pallas = self.use_pallas
        use_pallas = default_use_pallas(use_pallas)

        def one(m, v):
            pts, vals, valid = extract_points(m, v, self.max_points)
            if use_pallas:
                from .pallas.idw_kernel import idw_3d_knn_pallas

                return idw_3d_knn_pallas(pts, vals, valid, (D, H, W),
                                         self.k, self.rho, self.tau)
            return idw_3d_knn(pts, vals, valid, (D, H, W), k=self.k,
                              rho=self.rho, tau=self.tau, chunk=self.chunk)

        out = jax.vmap(one)(mask_dhw, vals_dhw)  # (B, D, H, W)
        return jnp.transpose(out, (0, 2, 3, 1))


class UPPos(nn.Module):
    """Bilinear x2 upsample + learnable per-pixel positional gate + 1x1 proj.

    Reference UPPos (layer.py:384-399): x = up(x); x += x * (2*sigmoid(pos)-1);
    relu(proj(x)). ``pos`` has the *output* spatial shape (H, W) given at
    construction (the constructor's H/W args are the post-upsample dims).
    """

    in_ch: int
    out_ch: int
    H: int
    W: int
    # Serving-only: the gate is per-PIXEL (pos has one channel), so it
    # commutes with the channel-mixing 1x1 proj — W(x * 2sig(pos)) =
    # 2sig(pos) * (W x) — moving the elementwise pass off the wide input
    # tensor (up to (B,128,128,128) f32) into the conv's epilogue on the
    # half-width output. Same math reassociated (float error ~1 ulp);
    # training keeps the reference order.
    fold_gate: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pos = self.param("pos", nn.initializers.zeros, (1, self.H, self.W, 1))
        x = bilinear_upsample2x_align_corners(x)
        proj = Conv2dTorch(self.in_ch, self.out_ch, 1, padding=0,
                           use_bias=True, name="proj")
        if self.fold_gate:
            # x + x*(2sig(pos)-1) == x * 2sig(pos)
            x = proj(x, post_scale=2.0 * jax.nn.sigmoid(pos.astype(x.dtype)))
        else:
            gate = 2.0 * jax.nn.sigmoid(pos.astype(x.dtype)) - 1.0
            x = x + x * gate
            x = proj(x)
        return jax.nn.relu(x)


class FFTBenchComplexConv(nn.Module):
    """Spectral-domain MLP (reference fft_bench_complex_conv, layer.py:364-381;
    unused by shipped models, kept for capability parity)."""

    dim: int
    dw: float = 1.0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        hid = int(self.dim * self.dw)
        y = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="backward")
        y = jnp.concatenate([y.real, y.imag], axis=-1)
        y = Conv2dTorch(2 * C, 2 * hid, 1, use_bias=self.use_bias, name="conv1")(y)
        y = jax.nn.relu(y)
        y = Conv2dTorch(2 * hid, 2 * C, 1, use_bias=self.use_bias, name="conv2")(y)
        y_re, y_im = jnp.split(y, 2, axis=-1)
        y = jnp.fft.irfft2(jax.lax.complex(y_re, y_im), s=(H, W), axes=(1, 2),
                           norm="backward")
        return y.astype(x.dtype)
