"""Fused maxpool-2x2 + channel-duplicate Pallas kernel.

``downsample_duplicate_channels`` is pure bandwidth (read once, write half
the pixels at twice the channels) but XLA lowers the pool + duplicate pair
to 5D reduce-windows with scratch layouts (~2.4 ms/event in PROFILE.md,
~25x over the HBM roofline). This kernel does both in one VMEM pass: 2x2
max via two reshape-max steps, channel interleave-duplication as a constant
binary matmul on the MXU (a lane-dim interleave reshape is not
Mosaic-friendly; the (C, 2C) one-hot matmul is).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=16)
def _dup_matrix(C: int) -> np.ndarray:
    R = np.zeros((C, 2 * C), np.float32)
    idx = np.arange(C)
    R[idx, 2 * idx] = 1.0
    R[idx, 2 * idx + 1] = 1.0
    return R


def _pool_dup_kernel(x_ref, dup_ref, o_ref, *, bh: int, W: int, C: int):
    x = x_ref[...]                                        # (2*bh, W, C)
    a = jnp.max(x.reshape(bh, 2, W, C), axis=1)           # row pairs
    m = jnp.max(a.reshape(bh, W // 2, 2, C), axis=2)      # column pairs
    o = jnp.dot(m.reshape(bh * (W // 2), C), dup_ref[...],
                preferred_element_type=jnp.float32)
    o_ref[...] = o.reshape(bh, W // 2, 2 * C)


@functools.partial(jax.jit, static_argnames=("bh",))
def maxpool2_duplicate_pallas(x: jax.Array, bh: int = 8) -> jax.Array:
    """(N, H, W, C) float32 -> (N, H/2, W/2, 2C): 2x2 maxpool + consecutive
    channel duplication (reference DownsampleDuplicateChannels semantics)."""
    N, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0
    rows = N * H // 2                    # output row index; pairs never span
    x2 = x.reshape(N * H, W, C)          # images because H is even
    bh = min(bh, rows)
    while rows % bh:
        bh -= 1

    out = pl.pallas_call(
        functools.partial(_pool_dup_kernel, bh=bh, W=W, C=C),
        grid=(rows // bh,),
        in_specs=[pl.BlockSpec((2 * bh, W, C), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, 2 * C), lambda j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bh, W // 2, 2 * C), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, W // 2, 2 * C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=rows * (W // 2) * C * (3 + 4 * C),
            bytes_accessed=4 * (N * H * W * C + rows * (W // 2) * 2 * C),
            transcendentals=0,
        ),
    )(x2.astype(jnp.float32), jnp.asarray(_dup_matrix(C)))
    return out.reshape(N, H // 2, W // 2, 2 * C)


@jax.custom_vjp
def maxpool2_duplicate(x: jax.Array) -> jax.Array:
    if x.dtype != jnp.float32:
        # the kernel upcasts internally and would return f32 for a bf16
        # input while the custom-vjp backward builds its reference at the
        # ORIGINAL dtype -> cryptic cotangent dtype mismatch under grad;
        # callers with other dtypes use the XLA fallback
        # (layers.downsample_duplicate_channels gates on f32 already)
        raise TypeError(
            f"maxpool2_duplicate expects float32, got {x.dtype}")
    return maxpool2_duplicate_pallas(x)


def _fwd(x):
    return maxpool2_duplicate_pallas(x), x


def _bwd(x, g):
    # backward re-derived from the XLA formulation (identical math)
    from ..convs import max_pool2d

    def ref(v):
        B, H, W, C = v.shape
        y = max_pool2d(v, 2, 2)
        y = y.reshape(B, H // 2, W // 2, C, 1)
        y = jnp.concatenate([y, y], axis=-1)
        return y.reshape(B, H // 2, W // 2, C * 2)

    _, vjp = jax.vjp(ref, x)
    return vjp(g)


maxpool2_duplicate.defvjp(_fwd, _bwd)
