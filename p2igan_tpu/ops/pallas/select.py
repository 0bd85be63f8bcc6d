"""Shared explicit tie-break for the iterative min-extraction kernels.

Mosaic's native argmin tie rule is NON-standard on both axes (measured on
v5e: the lane axis prefers the highest lane then the lowest 128-lane group;
the sublane axis follows the pairwise reduction tree — e.g. tied rows {3,4}
pick 4), so every selection round breaks ties explicitly instead: an
integer min-reduce over the tied candidates' indices has no ties by
construction and reproduces XLA/numpy first-index order — i.e. the torch
reference's flat frame-major selection order — bit-exactly on hardware.

This rule is the load-bearing parity invariant of the IDW kernels
(BASELINE.md tolerance table); it lives in exactly one place so the
factored and generic kernels can never desynchronize.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BIG_I32 = np.int32(np.iinfo(np.int32).max)


def first_min_index(d: jax.Array, d_min: jax.Array, idx: jax.Array,
                    axis: int, keepdims: bool = False) -> jax.Array:
    """Lowest index along ``axis`` attaining the precomputed min ``d_min``.

    ``idx`` is the candidate index grid (same shape as ``d``, e.g. a
    ``broadcasted_iota`` along ``axis``); ``d_min`` must already be reduced
    over ``axis`` with shape broadcastable against ``d``.
    """
    return jnp.min(jnp.where(d == d_min, idx, jnp.int32(_BIG_I32)),
                   axis=axis, keepdims=keepdims)
