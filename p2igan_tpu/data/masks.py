"""Observation-mask generators (5 types), host + pure-JAX implementations.

Semantics match the reference ``create_mask`` (reference
``p2igan_bench/data/sti_dataset.py:18-122``). Convention throughout:
**mask == 1 means the pixel is observed**; ``masked = video * mask``.

Types:
  * ``sti``        one random pixel observed per ``block_size``-sized spatial
                   block, the same spatial pattern repeated over all T frames
  * ``fi``         frame interpolation — whole frames observed every
                   ``interval+1`` steps (interval drawn from a list)
  * ``nowcasting`` first ``keep`` frames observed, rest hidden
  * ``stin``       reference quirk preserved: the per-frame sti masks of the
                   loop are overwritten so only the *last* drawn sti pattern
                   survives, applied to all frames, then the first ``keep``
                   frames are set fully observed (sti_dataset.py:80-102)
  * ``stis``       fixed gauge mask loaded from a whitespace txt file,
                   broadcast over frames/channels (deterministic)

Host variants are pure functions of a ``numpy.random.Generator`` (the data
pipeline generates masks per item on host threads); JAX variants are pure
functions of a key with static shape/size arguments so they can live inside
jitted, device-resident pipelines.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Host (numpy) implementations
# ---------------------------------------------------------------------------


def _sti_matrix_np(rng: np.random.Generator, H: int, W: int, block_size: int) -> np.ndarray:
    """(H, W) float32 with exactly one 1 in each block_size x block_size cell."""
    mat = np.zeros((H, W), dtype=np.float32)
    for h0 in range(0, H, block_size):
        h1 = min(h0 + block_size, H)
        for w0 in range(0, W, block_size):
            w1 = min(w0 + block_size, W)
            mat[rng.integers(h0, h1), rng.integers(w0, w1)] = 1.0
    return mat


@functools.lru_cache(maxsize=16)
def load_gauge_mask(mask_file: str) -> np.ndarray:
    """Load a fixed (H, W) 0/1 gauge mask from a txt file (stis type)."""
    mask = np.loadtxt(Path(mask_file))
    return mask.astype(bool)


def create_mask_np(
    shape: Tuple[int, int, int, int],
    rng: Optional[np.random.Generator] = None,
    mask_type: str = "sti",
    mask_file: Optional[str] = None,
    block_sizes: Sequence[int] = (4,),
    keep: int = 4,
    interval: Sequence[int] = (2, 5),
) -> np.ndarray:
    """Create a (T, H, W, C) float32 observation mask (reference create_mask)."""
    T, H, W, C = shape
    rng = rng or np.random.default_rng()

    if mask_type == "sti":
        mat = _sti_matrix_np(rng, H, W, int(rng.choice(list(block_sizes))))
        return np.broadcast_to(mat[None, :, :, None], (T, H, W, C)).astype(np.float32)

    if mask_type == "fi":
        mask = np.zeros((T, H, W, C), dtype=np.float32)
        chosen = int(rng.choice(list(interval)))
        mask[0:T:chosen + 1] = 1.0
        return mask

    if mask_type == "nowcasting":
        mask = np.ones((T, H, W, C), dtype=np.float32)
        mask[keep:] = 0.0
        return mask

    if mask_type == "stin":
        # Reference quirk: per-frame sti masks are overwritten inside the loop
        # so only the last drawn pattern is used, repeated over all frames,
        # then the first `keep` frames are forced fully observed.
        if keep >= T:
            return np.ones((T, H, W, C), dtype=np.float32)
        mat = _sti_matrix_np(rng, H, W, int(rng.choice(list(block_sizes))))
        mask = np.broadcast_to(mat[None, :, :, None], (T, H, W, C)).astype(np.float32)
        mask[:keep] = 1.0
        return mask

    if mask_type == "stis":
        if mask_file is None:
            raise ValueError("mask_file is required for 'stis' masks")
        mat = load_gauge_mask(str(mask_file))
        if mat.shape != (H, W):
            raise ValueError(
                f"Mask matrix in {mask_file} does not match video spatial dimensions {H}x{W}"
            )
        mask = np.broadcast_to(mat[None, :, :, None], (T, H, W, C))
        return mask.astype(np.float32)

    raise ValueError(f"Invalid mask type: {mask_type!r}")


# ---------------------------------------------------------------------------
# JAX implementations (pure functions of a key; static sizes)
# ---------------------------------------------------------------------------


def _sti_matrix_jax(key: jax.Array, H: int, W: int, block_size: int) -> jax.Array:
    """(H, W) float32 sti pattern; one observed pixel per block (vectorized)."""
    nh = -(-H // block_size)
    nw = -(-W // block_size)
    kh, kw = jax.random.split(key)
    h0 = jnp.arange(nh) * block_size
    w0 = jnp.arange(nw) * block_size
    bh = jnp.minimum(block_size, H - h0)  # (nh,) edge blocks are smaller
    bw = jnp.minimum(block_size, W - w0)
    uh = jax.random.uniform(kh, (nh, nw))
    uw = jax.random.uniform(kw, (nh, nw))
    ph = h0[:, None] + jnp.floor(uh * bh[:, None]).astype(jnp.int32)
    pw = w0[None, :] + jnp.floor(uw * bw[None, :]).astype(jnp.int32)
    flat_idx = (ph * W + pw).reshape(-1)
    mat = jnp.zeros((H * W,), jnp.float32).at[flat_idx].set(1.0)
    return mat.reshape(H, W)


def sti_mask(key: jax.Array, T: int, H: int, W: int, C: int = 1, block_size: int = 4) -> jax.Array:
    mat = _sti_matrix_jax(key, H, W, block_size)
    return jnp.broadcast_to(mat[None, :, :, None], (T, H, W, C))


def fi_mask(key: jax.Array, T: int, H: int, W: int, C: int = 1,
            interval: Sequence[int] = (2, 5)) -> jax.Array:
    interval = jnp.asarray(list(interval))
    chosen = interval[jax.random.randint(key, (), 0, interval.shape[0])]
    t = jnp.arange(T)
    frame_on = (t % (chosen + 1) == 0).astype(jnp.float32)
    return jnp.broadcast_to(frame_on[:, None, None, None], (T, H, W, C))


def nowcasting_mask(T: int, H: int, W: int, C: int = 1, keep: int = 4) -> jax.Array:
    frame_on = (jnp.arange(T) < keep).astype(jnp.float32)
    return jnp.broadcast_to(frame_on[:, None, None, None], (T, H, W, C))


def stin_mask(key: jax.Array, T: int, H: int, W: int, C: int = 1,
              block_size: int = 4, keep: int = 4) -> jax.Array:
    if keep >= T:
        return jnp.ones((T, H, W, C), jnp.float32)
    base = sti_mask(key, T, H, W, C, block_size)
    frame_keep = (jnp.arange(T) < keep)[:, None, None, None]
    return jnp.where(frame_keep, 1.0, base)


def stis_mask(mask_matrix: jax.Array, T: int, C: int = 1) -> jax.Array:
    """Broadcast a fixed (H, W) gauge mask over frames/channels."""
    H, W = mask_matrix.shape
    return jnp.broadcast_to(mask_matrix.astype(jnp.float32)[None, :, :, None], (T, H, W, C))


def create_mask(
    key: jax.Array,
    shape: Tuple[int, int, int, int],
    mask_type: str = "sti",
    mask_matrix: Optional[jax.Array] = None,
    block_sizes: Sequence[int] = (4,),
    keep: int = 4,
    interval: Sequence[int] = (2, 5),
) -> jax.Array:
    """JAX dispatcher over the 5 mask types.

    ``block_sizes`` selection is handled with ``lax.switch`` over per-size
    branches (block size changes the block-grid shape, which must be static
    under jit).
    """
    T, H, W, C = shape
    if mask_type == "sti" or mask_type == "stin":
        fn = sti_mask if mask_type == "sti" else functools.partial(stin_mask, keep=keep)
        sizes = list(block_sizes)
        ksel, kgen = jax.random.split(key)
        if len(sizes) == 1:
            return fn(kgen, T, H, W, C, block_size=sizes[0])
        branches = [functools.partial(fn, T=T, H=H, W=W, C=C, block_size=s) for s in sizes]
        idx = jax.random.randint(ksel, (), 0, len(sizes))
        return jax.lax.switch(idx, branches, kgen)
    if mask_type == "fi":
        return fi_mask(key, T, H, W, C, interval)
    if mask_type == "nowcasting":
        return nowcasting_mask(T, H, W, C, keep)
    if mask_type == "stis":
        if mask_matrix is None:
            raise ValueError("mask_matrix required for 'stis'")
        return stis_mask(mask_matrix, T, C)
    raise ValueError(f"Invalid mask type: {mask_type!r}")
