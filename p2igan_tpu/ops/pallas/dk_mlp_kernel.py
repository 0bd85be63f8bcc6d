"""Fused DK/STDK MLP tail: the whole 100-100-100-1 chain in VMEM.

Reference loop being replaced: ``p2igan_bench/models/dk.py:191-197`` /
``stdk.py:149-186`` build per-pixel feature rows and push them through the
shared MLP one frame at a time. The repo's scan formulation (models/dk.py)
already avoids materializing features, but XLA still spills every hidden
activation — (B, HW, 100) ≈ 52 MB per frame — to HBM between the four
Linear layers, so the family runs at ~1% MFU-equivalent (VERDICT r3 weak #1:
~4–5 full HBM passes over the hidden tensor per frame).

Both families reduce to the same tail once the first layer is decomposed:

    y[j, p] = MLP_tail( phi_part[p] + offset[j] )        j = (b, t), p = pixel

with ``phi_part = phi_s @ W1_s`` (HW, hidden) shared by every (b, t) and a
per-(b, t) hidden offset (dk: ``z_t @ W1_z + b1``; stdk:
``z_seq @ W_z + phi_t @ W_t + b1``). This kernel tiles HW into VMEM blocks,
keeps the ~90 KB of weights resident, and runs add→relu→fc2→relu→fc3→relu→fc4
without touching HBM in between. Traffic per (HW tile, j-chunk) grid cell is
the phi tile (revisited: constant across the inner j axis) plus the (chunk,
tile) output — ~100x less HBM traffic than the unfused chain; the matmuls
land on the MXU at the padded hidden width of 128 lanes.

Padding is exact, not approximate: hidden 100 → 128 with zero weight
rows/cols and zero biases, so padded lanes carry relu(0) = 0 through every
layer and contribute nothing to real outputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def mlp_tail_reference(phi_part, offsets, fc2, b2, fc3, b3, fc4, b4):
    """Plain-jnp oracle (and CPU fallback), scanning j-chunks to bound memory.

    phi_part: (HW, h). offsets: (J, h). fc2/fc3: (h, h); b2/b3: (h,);
    fc4: (h,); b4: scalar. Returns (J, HW) float32.
    """
    def one(off):  # off: (h,)
        h1 = jax.nn.relu(phi_part + off[None, :])
        h2 = jax.nn.relu(h1 @ fc2 + b2[None, :])
        h3 = jax.nn.relu(h2 @ fc3 + b3[None, :])
        return h3 @ fc4 + b4  # (HW,)

    return jax.lax.map(one, offsets)


def _kernel(phi_ref, off_ref, fc2_ref, b2_ref, fc3_ref, b3_ref, fc4_ref,
            b4_ref, out_ref):
    # Blocks: phi (tile, Hp) — constant over the inner grid axis, so Pallas
    # keeps it resident in VMEM while j-chunks stream; off (chunk, Hp);
    # weights full; out (chunk, tile).
    phi = phi_ref[:]                        # (tile, Hp)
    off = off_ref[:]                        # (chunk, Hp)
    chunk, tile = out_ref.shape
    hp = phi.shape[1]

    h = jax.nn.relu(off[:, None, :] + phi[None, :, :])   # (chunk, tile, Hp)
    h = h.reshape(chunk * tile, hp)
    # Default TPU matmul precision (one bf16 MXU pass, f32 accumulate) —
    # identical numerics to the unfused XLA path the parity tests pin.
    h = jax.nn.relu(
        jax.lax.dot_general(h, fc2_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + b2_ref[0][None, :])
    h = jax.nn.relu(
        jax.lax.dot_general(h, fc3_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + b3_ref[0][None, :])
    # fc4 is (Hp, 1): a lane-reduction on the VPU beats a 1-lane MXU pass.
    y = jnp.sum(h * fc4_ref[0][None, :], axis=-1) + b4_ref[0, 0]
    out_ref[:] = y.reshape(chunk, tile)


@functools.partial(jax.jit, static_argnames=("tile", "chunk", "cost_hidden"))
def _mlp_tail_pallas(phi_p, off_p, fc2_p, b2_p, fc3_p, b3_p, fc4_p, b4_p,
                     tile: int, chunk: int, cost_hidden: int | None = None):
    HWp, Hp = phi_p.shape
    Jp = off_p.shape[0]
    grid = (HWp // tile, Jp // chunk)
    # Surface the kernel's FLOPs to XLA cost_analysis (bench MFU accounting).
    # Report the ALGORITHM's flops at the true hidden width (cost_hidden),
    # not the lane-padded width the hardware executes — same convention as
    # the unfused path, so MFU numbers stay comparable across rounds.
    h = cost_hidden or Hp
    flops = Jp * HWp * (4 * h * h + 4 * h)
    bytes_accessed = 4 * (grid[1] * HWp * Hp   # phi re-reads per j-chunk
                          + Jp * Hp + Jp * HWp + 2 * Hp * Hp)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        cost_estimate=pl.CostEstimate(flops=flops, transcendentals=0,
                                      bytes_accessed=bytes_accessed),
        in_specs=[
            pl.BlockSpec((tile, Hp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, Hp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, Hp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, Hp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((chunk, tile), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Jp, HWp), jnp.float32),
    )(phi_p, off_p, fc2_p, b2_p, fc3_p, b3_p, fc4_p, b4_p)


def pad_hidden(h: int) -> int:
    """Padded hidden width (lane multiple)."""
    return _round_up(h, LANE)


def pad_tail_weights(fc2, b2, fc3, b3, fc4, b4):
    """Zero-pad the (tiny) tail weights to the lane-aligned hidden width.

    Padding the ~90 KB of weights instead of the multi-MB activations keeps
    the hot path free of relayout copies: callers produce lane-aligned
    phi_part/offsets directly by padding the *first-layer* weight columns
    before their own matmul (see models/dk.py)."""
    h = fc2.shape[0]
    Hp = pad_hidden(h)
    f32 = jnp.float32
    fc2_p = jnp.zeros((Hp, Hp), f32).at[:h, :h].set(fc2.astype(f32))
    fc3_p = jnp.zeros((Hp, Hp), f32).at[:h, :h].set(fc3.astype(f32))
    b2_p = jnp.zeros((1, Hp), f32).at[0, :h].set(b2.astype(f32))
    b3_p = jnp.zeros((1, Hp), f32).at[0, :h].set(b3.astype(f32))
    fc4_p = jnp.zeros((1, Hp), f32).at[0, :h].set(fc4.astype(f32))
    b4_p = jnp.asarray(b4, f32).reshape(1, 1)
    return fc2_p, b2_p, fc3_p, b3_p, fc4_p, b4_p


def _pick_tiles(HW: int, J: int) -> tuple[int, int]:
    """Largest measured-fast (tile, chunk) that divides the padded problem.

    On-chip sweep (v5e, HW=16384, J=128, Hp=128): (2048, 16) = 1.25 ms
    (110 TF/s incl. lane padding), (512, 8) = 1.51 ms; smaller tiles lose
    grid-overhead, larger chunks lose VMEM pipelining."""
    for tile in (2048, 1024, 512, 256, LANE):
        if tile <= _round_up(HW, LANE):
            break
    for chunk in (16, 8):
        if chunk <= _round_up(J, 8):
            break
    return tile, chunk


def mlp_tail_fused_padded(phi_p, off_p, fc2_p, b2_p, fc3_p, b3_p, fc4_p,
                          b4_p, cost_hidden: int | None = None) -> jax.Array:
    """Pallas tail on lane-aligned inputs: (HW, Hp), (J, Hp) -> (J, HW).

    HW / J may be arbitrary; they are padded here (cheap row padding). The
    hidden dim must already be the lane-aligned Hp with exact zero pads
    (pad_tail_weights + padded first-layer weights)."""
    HW, Hp = phi_p.shape
    J = off_p.shape[0]
    tile, chunk = _pick_tiles(HW, J)
    HWp = _round_up(HW, tile)
    Jp = _round_up(J, chunk)
    if HWp != HW:
        phi_p = jnp.pad(phi_p, ((0, HWp - HW), (0, 0)))
    if Jp != J:
        off_p = jnp.pad(off_p, ((0, Jp - J), (0, 0)))
    out = _mlp_tail_pallas(phi_p, off_p, fc2_p, b2_p, fc3_p, b3_p, fc4_p,
                           b4_p, tile=tile, chunk=chunk,
                           cost_hidden=cost_hidden)
    return out[:J, :HW] if (HWp != HW or Jp != J) else out


def mlp_tail_fused(phi_part, offsets, fc2, b2, fc3, b3, fc4, b4,
                   use_pallas: bool | None = None) -> jax.Array:
    """Fused tail over all (b, t) at once: (HW, h), (J, h) -> (J, HW).

    Forward-only (serving path); training keeps the scan formulation in
    models/dk.py. ``use_pallas=None`` resolves to the backend default.
    """
    from ..idw import default_use_pallas

    if not default_use_pallas(use_pallas):
        return mlp_tail_reference(phi_part, offsets, fc2, b2, fc3, b3,
                                  fc4, b4)

    HW, h = phi_part.shape
    J = offsets.shape[0]
    Hp = pad_hidden(h)
    f32 = jnp.float32
    phi_p = jnp.zeros((HW, Hp), f32).at[:, :h].set(phi_part.astype(f32))
    off_p = jnp.zeros((J, Hp), f32).at[:, :h].set(offsets.astype(f32))
    padded = pad_tail_weights(fc2, b2, fc3, b3, fc4, b4)
    return mlp_tail_fused_padded(phi_p, off_p, *padded, cost_hidden=h)
