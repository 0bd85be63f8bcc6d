"""Fused uint8 decode -> [0,1] normalize -> mask-apply Pallas kernel.

The host pipeline ships raw uint8 zarr windows to the device; this kernel
fuses the ``astype(float32)/255`` decode (reference ``sti_dataset.py:310``)
with the observation-mask multiply (``masked = video * mask``) in one VMEM
pass, emitting both the normalized video and the masked video without an
intermediate float32 round-trip through HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(u8_ref, mask_ref, video_ref, masked_ref):
    # true division: bit-identical to the host pipeline's numpy `v / 255.0`
    v = u8_ref[...].astype(jnp.float32) / 255.0
    video_ref[...] = v
    masked_ref[...] = v * mask_ref[...]


def decode_normalize_mask(frames_u8: jax.Array, mask: jax.Array,
                          use_pallas: bool | None = None):
    """(..., H, W) uint8 + 0/1 mask -> (video, masked) float32 in [0, 1]."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:  # XLA fallback (CPU tests / non-TPU backends)
        video = frames_u8.astype(jnp.float32) / 255.0
        return video, video * mask.astype(jnp.float32)
    orig_shape = frames_u8.shape
    H, W = orig_shape[-2], orig_shape[-1]
    n = 1
    for s in orig_shape[:-2]:
        n *= s
    u8 = frames_u8.reshape(n * H, W)
    m = mask.astype(jnp.float32).reshape(n * H, W)

    video, masked = pl.pallas_call(
        _decode_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(u8.shape, jnp.float32),
                   jax.ShapeDtypeStruct(u8.shape, jnp.float32)),
    )(u8, m)
    return video.reshape(orig_shape), masked.reshape(orig_shape)
