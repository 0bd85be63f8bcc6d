"""Explicit RNG-key plumbing.

Replaces the reference's global seeding (reference ``scripts/train.py:78-82``
seeds python/numpy/torch RNGs globally) with functional ``jax.random`` keys.
Host-side samplers (mask generation in the data pipeline) still use seeded
``numpy.random.Generator`` streams derived per item for reproducibility.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed host RNGs and return a root JAX key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


class KeyStream:
    """A stateful convenience wrapper producing fresh keys from a root key.

    Use at orchestration level only; jitted code takes explicit keys.
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key
        self._count = 0

    def next(self) -> jax.Array:
        self._count += 1
        return jax.random.fold_in(self._key, self._count)

    def __call__(self) -> jax.Array:
        return self.next()
