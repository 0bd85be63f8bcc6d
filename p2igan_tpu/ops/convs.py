"""Functional convolution / pooling / resize primitives (NHWC / NDHWC layout).

Semantics mirror the torch ops the reference models are built from
(``torch.nn.functional`` conv/pool/upsample), but expressed TPU-first:
channel-last layouts, HWIO kernels for XLA's native tiling, bilinear
upsampling as two small dense matmuls (exact align_corners=True math on the
MXU instead of gather-heavy interpolation).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

IntOrPair = Union[int, Tuple[int, int]]


def _pair(v: IntOrPair, n: int = 2) -> Tuple[int, ...]:
    if isinstance(v, (tuple, list)):
        if len(v) != n:
            raise ValueError(
                f"expected a length-{n} stride/padding, got {tuple(v)}")
        return tuple(v)
    return (v,) * n


def conv2d(
    x: jax.Array,  # (B, H, W, Cin)
    kernel: jax.Array,  # (kh, kw, Cin/groups, Cout) HWIO
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    groups: int = 1,
    bias: Optional[jax.Array] = None,
    dilation: IntOrPair = 1,
) -> jax.Array:
    pad = _pair(padding)
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=_pair(stride),
        padding=[(pad[0], pad[0]), (pad[1], pad[1])],
        rhs_dilation=_pair(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


def conv3d(
    x: jax.Array,  # (B, T, H, W, Cin)
    kernel: jax.Array,  # (kt, kh, kw, Cin/groups, Cout) DHWIO
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    groups: int = 1,
    bias: Optional[jax.Array] = None,
    decompose_t: bool = False,
) -> jax.Array:
    st = _pair(stride, 3)
    pad = _pair(padding, 3)
    kt = kernel.shape[0]
    if decompose_t and groups == 1 and kt > 1:
        # Temporal-tap decomposition: out[:, t] = sum_dt conv2d(
        # x_tpad[:, t*st+dt], k[dt]) — T folds into the conv batch and each
        # tap is a well-tiled NHWC 2D conv. Same dot products, summed
        # tap-major (ulp-level reassociation). MEASURED NEGATIVE on the GAN
        # train step (58.5 -> 72.1 ms at batch 12): XLA's 5D emitter
        # ("EmitAllBatchInSublanes") runs the (3,3,3) convs at only ~12% of
        # MXU peak, but the decomposition's three shifted temporal slices
        # materialize full input copies in fwd AND both backward chains,
        # and that HBM traffic costs more than the emitter saves. Kept
        # opt-in for future shapes where the slices fuse.
        B, T, H, W, C = x.shape
        if pad[0]:
            x = jnp.pad(x, ((0, 0), (pad[0], pad[0]), (0, 0), (0, 0), (0, 0)))
        Tp = x.shape[1]
        t_out = (Tp - kt) // st[0] + 1
        out = None
        for dt in range(kt):
            xs = x[:, dt:dt + (t_out - 1) * st[0] + 1:st[0]]
            o2 = jax.lax.conv_general_dilated(
                xs.reshape(B * t_out, H, W, C),
                kernel[dt],
                window_strides=st[1:],
                padding=[(pad[1], pad[1]), (pad[2], pad[2])],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = o2 if out is None else out + o2
        out = out.reshape(B, t_out, out.shape[1], out.shape[2], out.shape[3])
        if bias is not None:
            out = out + bias
        return out
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=st,
        padding=[(p, p) for p in pad],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


def conv1d(
    x: jax.Array,  # (B, L, Cin)
    kernel: jax.Array,  # (k, Cin/groups, Cout)
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


def conv_transpose2d(
    x: jax.Array,
    kernel: jax.Array,  # (kh, kw, Cout, Cin): the gradient-conv (forward) HWIO
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Matches torch ConvTranspose2d(stride=s, padding=p) semantics.

    torch stores transposed-conv weights as (Cin, Cout, kh, kw); pass them
    here as (kh, kw, Cout, Cin) — the HWIO layout of the *forward* conv whose
    gradient this computes (lax transpose_kernel=True flips spatial dims and
    swaps I/O internally). Output size = (H-1)*s - 2p + k.
    """
    st = _pair(stride)
    pad = _pair(padding)
    kh, kw = kernel.shape[0], kernel.shape[1]
    out = jax.lax.conv_transpose(
        x,
        kernel,
        strides=st,
        padding=[(kh - 1 - pad[0], kh - 1 - pad[0]), (kw - 1 - pad[1], kw - 1 - pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    if bias is not None:
        out = out + bias
    return out


def conv_transpose3d(
    x: jax.Array,
    kernel: jax.Array,  # (kt, kh, kw, Cout, Cin) — see conv_transpose2d
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    st = _pair(stride, 3)
    pad = _pair(padding, 3)
    ks = kernel.shape[:3]
    out = jax.lax.conv_transpose(
        x,
        kernel,
        strides=st,
        padding=[(k - 1 - p, k - 1 - p) for k, p in zip(ks, pad)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        transpose_kernel=True,
    )
    if bias is not None:
        out = out + bias
    return out


def max_pool2d(x: jax.Array, kernel_size: IntOrPair, stride: Optional[IntOrPair] = None,
               padding: IntOrPair = 0) -> jax.Array:
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    p = _pair(padding)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)),
    )


def avg_pool2d(x: jax.Array, kernel_size: IntOrPair, stride: Optional[IntOrPair] = None,
               padding: IntOrPair = 0, count_include_pad: bool = True) -> jax.Array:
    """torch F.avg_pool2d semantics (count_include_pad=True by default)."""
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    p = _pair(padding)
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)),
    )
    if count_include_pad or (p[0] == 0 and p[1] == 0):
        return summed / (k[0] * k[1])
    ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)),
    )
    return summed / counts


@functools.lru_cache(maxsize=64)
def _align_corners_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) linear-interpolation matrix with align_corners=True."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        m[:, 0] = 1.0
        return m
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (src - lo).astype(np.float32)
    m[np.arange(n_out), lo] += 1.0 - w
    m[np.arange(n_out), hi] += w
    return m


def bilinear_upsample2x_align_corners(x: jax.Array) -> jax.Array:
    """Exact torch Upsample(scale_factor=2, mode='bilinear', align_corners=True).

    Expressed as two dense matmuls (separable interpolation) so the work lands
    on the MXU rather than gathers on the VPU. x: (B, H, W, C).
    """
    B, H, W, C = x.shape
    mh = jnp.asarray(_align_corners_matrix(H, 2 * H))
    mw = jnp.asarray(_align_corners_matrix(W, 2 * W))
    # (B,H,W,C) -> rows: (2H, H) @ (B,H,W*C); interpolation runs in f32
    # and restores the caller's dtype (the f32 matrices would otherwise
    # silently promote a bf16 compute_dtype pipeline)
    y = jnp.einsum("oh,bhwc->bowc", mh, x)
    y = jnp.einsum("ow,bhwc->bhoc", mw, y)
    return y.astype(x.dtype)


@functools.lru_cache(maxsize=64)
def _align_false_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear matrix with align_corners=False (half-pixel)."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    scale = n_in / n_out
    src = (np.arange(n_out) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (src - lo).astype(np.float32)
    m[np.arange(n_out), lo] += 1.0 - w
    m[np.arange(n_out), hi] += w
    return m


def bilinear_resize_align_false(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """torch F.interpolate(mode='bilinear', align_corners=False). x: (B,H,W,C)."""
    B, H, W, C = x.shape
    mh = jnp.asarray(_align_false_matrix(H, out_hw[0]))
    mw = jnp.asarray(_align_false_matrix(W, out_hw[1]))
    y = jnp.einsum("oh,bhwc->bowc", mh, x)
    y = jnp.einsum("ow,bhwc->bhoc", mw, y)
    return y.astype(x.dtype)  # see bilinear_upsample2x_align_corners


def reflect_pad2d(x: jax.Array, pad: int = 1) -> jax.Array:
    """Reflection padding on H and W of (..., H, W, C)."""
    nd = x.ndim
    cfg = [(0, 0)] * nd
    cfg[-3] = (pad, pad)
    cfg[-2] = (pad, pad)
    return jnp.pad(x, cfg, mode="reflect")
