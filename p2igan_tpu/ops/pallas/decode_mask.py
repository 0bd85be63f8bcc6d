"""Fused uint8 decode -> [0,1] normalize -> mask-apply Pallas kernel.

The host pipeline ships raw uint8 zarr windows to the device; this kernel
fuses the ``astype(float32)/255`` decode (reference ``sti_dataset.py:310``)
with the observation-mask multiply (``masked = video * mask``) in one VMEM
pass, emitting both the normalized video and the masked video without an
intermediate float32 round-trip through HBM. The mask stays in its shipped
dtype (uint8 from the raw pipeline) all the way into VMEM and widens
in-kernel, so the bandwidth-bound pass never reads a materialized f32 mask;
frame-constant ``(B, 1, H, W[, 1])`` masks are read once per sample via the
block index map rather than broadcast through HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..idw import default_use_pallas


def _widen(x):
    """uint8/bool/int or f32 -> f32 inside the kernel.

    Mosaic has no direct uint8->f32 (or uint32->f32) cast; integer and bool
    masks widen through int32, exact for the full 0..255 range (verified on
    chip). Other float dtypes are cast to f32 by the wrapper BEFORE the
    kernel (Mosaic's narrow-float cast support is uneven). Static branch."""
    if x.dtype == jnp.float32:
        return x
    return x.astype(jnp.int32).astype(jnp.float32)


def _decode_kernel(u8_ref, mask_ref, video_ref, masked_ref):
    # true division like the host pipeline's numpy `v / 255.0` (compilers on
    # both paths may strength-reduce to a reciprocal multiply: <=1 ULP)
    v = _widen(u8_ref[...]) / 255.0
    video_ref[...] = v
    masked_ref[...] = v * _widen(mask_ref[...])


def _frame_constant_mask(mask_shape, frames_shape) -> bool:
    """True for a ``(B, 1, ...)`` mask against ``(B, T, ...)`` frames (the
    sti/stis layout: one spatial observation pattern per sample)."""
    return (len(mask_shape) == len(frames_shape) and len(frames_shape) >= 3
            and mask_shape[1] == 1 and frames_shape[1] > 1
            and mask_shape[0] == frames_shape[0]
            and mask_shape[2:] == frames_shape[2:])


def decode_normalize_mask(frames_u8: jax.Array, mask: jax.Array,
                          use_pallas: bool | None = None,
                          block_rows: int = 1024):
    """(..., H, W[, 1]) uint8 + 0/1 mask -> (video, masked) float32 in [0, 1].

    The mask may be any dtype (uint8/bool widen in-kernel; floats cast to
    f32) and any shape broadcastable to ``frames_u8``; both backends
    broadcast so the contract is backend-independent. The frame-constant
    ``(B, 1, H, W[, 1])`` sti/stis mask is special-cased on the Pallas path:
    the block index map re-reads the per-sample mask for every frame block,
    so no broadcast copy is ever materialized in HBM. Trailing singleton
    axes (the channel-last ``(B,T,H,W,1)`` training batch layout) are
    collapsed before tiling so the kernel always sees a genuine ``(rows,
    W)`` lane layout, and the grid walks row blocks so VMEM residency is
    bounded regardless of batch size.
    """
    use_pallas = default_use_pallas(use_pallas)
    if not use_pallas:  # XLA fallback (CPU tests / non-TPU backends)
        video = frames_u8.astype(jnp.float32) / 255.0
        return video, video * jnp.broadcast_to(mask, frames_u8.shape
                                               ).astype(jnp.float32)
    orig_shape = frames_u8.shape
    if (jnp.issubdtype(mask.dtype, jnp.floating)
            and mask.dtype != jnp.float32):
        mask = mask.astype(jnp.float32)  # pre-kernel: see _widen
    frame_const = _frame_constant_mask(mask.shape, orig_shape)
    if not frame_const and mask.shape != orig_shape:
        mask = jnp.broadcast_to(mask, orig_shape)  # rare general case
    shape = list(orig_shape)
    while len(shape) > 2 and shape[-1] == 1:
        shape.pop()
    W = shape[-1]
    n = 1
    for s in shape[:-1]:
        n *= s
    u8 = frames_u8.reshape(n, W)

    if frame_const:
        # (B, 1, H, W[,1]) mask: grid walks (sample, row-block); the mask
        # spec maps every frame block of sample b to b's single mask block.
        B, T = orig_shape[0], orig_shape[1]
        rows_per_frame = n // (B * T)      # H * trailing non-collapsed dims
        m = mask.reshape(B * rows_per_frame, W)
        rows = min(block_rows, rows_per_frame)
        while rows_per_frame % rows:  # keep blocks frame-aligned: largest
            rows -= 1                 # divisor of rows_per_frame <= block
        blocks_per_frame = rows_per_frame // rows
        grid = (B * T * blocks_per_frame,)
        bpf = blocks_per_frame
        f_spec = pl.BlockSpec((rows, W), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        m_spec = pl.BlockSpec(
            (rows, W), lambda i: ((i // (T * bpf)) * bpf + i % bpf, 0),
            memory_space=pltpu.VMEM)
    else:
        m = mask.reshape(n, W)
        rows = min(block_rows, n)
        grid = (pl.cdiv(n, rows),)
        f_spec = pl.BlockSpec((rows, W), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        m_spec = f_spec

    video, masked = pl.pallas_call(
        _decode_kernel,
        grid=grid,
        in_specs=[f_spec, m_spec],
        out_specs=(f_spec, f_spec),
        out_shape=(jax.ShapeDtypeStruct((n, W), jnp.float32),
                   jax.ShapeDtypeStruct((n, W), jnp.float32)),
    )(u8, m)
    return video.reshape(orig_shape), masked.reshape(orig_shape)
