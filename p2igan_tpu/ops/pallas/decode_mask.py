"""Fused uint8 decode -> [0,1] normalize -> mask-apply Pallas kernel.

The host pipeline ships raw uint8 zarr windows to the device; this kernel
fuses the ``astype(float32)/255`` decode (reference ``sti_dataset.py:310``)
with the observation-mask multiply (``masked = video * mask``) in one VMEM
pass, emitting both the normalized video and the masked video without an
intermediate float32 round-trip through HBM. The mask stays in its shipped
dtype (uint8 from the raw pipeline) all the way into VMEM and widens
in-kernel, so the bandwidth-bound pass never reads a materialized f32 mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _widen(x):
    # Mosaic has no direct uint8->f32 cast; widen through int32 (exact for
    # the full 0..255 range, verified on chip). Static dtype branch.
    if x.dtype == jnp.float32:
        return x
    return x.astype(jnp.int32).astype(jnp.float32)


def _decode_kernel(u8_ref, mask_ref, video_ref, masked_ref):
    # true division: bit-identical to the host pipeline's numpy `v / 255.0`.
    v = _widen(u8_ref[...]) / 255.0
    video_ref[...] = v
    masked_ref[...] = v * _widen(mask_ref[...])


def decode_normalize_mask(frames_u8: jax.Array, mask: jax.Array,
                          use_pallas: bool | None = None,
                          block_rows: int = 1024):
    """(..., H, W[, 1]) uint8 + 0/1 mask -> (video, masked) float32 in [0, 1].

    The mask may be any dtype and any shape broadcastable to ``frames_u8``
    (e.g. a frame-constant ``(B,1,H,W,1)`` sti/stis mask); both backends
    broadcast explicitly so the contract is backend-independent. Trailing
    singleton axes (the channel-last ``(B,T,H,W,1)`` training batch layout)
    are collapsed before tiling so the kernel always sees a genuine
    ``(rows, W)`` lane layout, and the grid walks row blocks so VMEM
    residency is bounded at ``4 * block_rows * W * 4`` bytes regardless of
    batch size.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    mask = jnp.broadcast_to(mask, frames_u8.shape)
    if not use_pallas:  # XLA fallback (CPU tests / non-TPU backends)
        video = frames_u8.astype(jnp.float32) / 255.0
        return video, video * mask.astype(jnp.float32)
    orig_shape = frames_u8.shape
    shape = list(orig_shape)
    while len(shape) > 2 and shape[-1] == 1:
        shape.pop()
    W = shape[-1]
    n = 1
    for s in shape[:-1]:
        n *= s
    u8 = frames_u8.reshape(n, W)
    m = mask.reshape(n, W)

    rows = min(block_rows, n)
    spec = pl.BlockSpec((rows, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    video, masked = pl.pallas_call(
        _decode_kernel,
        grid=(pl.cdiv(n, rows),),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((n, W), jnp.float32),
                   jax.ShapeDtypeStruct((n, W), jnp.float32)),
    )(u8, m)
    return video.reshape(orig_shape), masked.reshape(orig_shape)
