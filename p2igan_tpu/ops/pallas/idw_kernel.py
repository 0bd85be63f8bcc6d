"""Pallas TPU kernel for IDW k-NN densification — the hottest irregular op.

The reference's ``idw_3d_knn`` (reference ``modules/layer.py:259-293``) is a
chunked cdist -> topk -> weighted gather. The XLA fallback in ``ops/idw.py``
materializes the (chunk, P) distance matrix in HBM between ops; this kernel
keeps the whole tile resident in VMEM: squared distances are computed by VPU
broadcasting (the 3-wide matmul would waste the 128-wide MXU contraction),
the k=4 nearest neighbours are extracted by iterative argmin rounds in
registers, and only the (Q_BLK,) result is written back — HBM traffic drops
from ~10 passes over the distance matrix to just grid + points + output.

Gradients: the kernel is wrapped in ``jax.custom_vjp``; the backward is a
second Pallas kernel producing d_values directly (values-gradient =
normalized IDW weights scattered to the selected points). The selection
weights depend only on geometry, so no value residuals are needed and the
backward reuses the forward's exact arithmetic — consistent selection even
at distance ties, and no (Q, P) candidate tensors in HBM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..idw import grid_points, round_up
from .select import first_min_index


def _first_min_col(d, d_min, col):
    """Lowest-index column attaining the row minimum (explicit tie-break,
    see ops/pallas/select.py for the rationale)."""
    return first_min_index(d, d_min, col, axis=1, keepdims=True)


def _weight_from_d(d_min, rho: float, tau: float):
    """IDW weight from the winner distance; shared by the forward and
    backward kernels so their selection arithmetic stays identical
    (invalid points carry a 1e30 penalty -> d ~1e15, making w ~1e-30 —
    effectively zero without an explicit mask, matching the reference)."""
    if abs(rho - 2.0) < 1e-6:
        invd = 1.0 / (d_min + tau)
        return invd * invd
    return 1.0 / jnp.power(d_min + tau, rho)


def _prep_points(points_xyz, valid):
    """(pts (3, Pp), penalty (1, Pp), Pp): lane-padded transposed points +
    validity penalty, shared by the forward and backward wrappers."""
    P = points_xyz.shape[0]
    Pp = round_up(max(P, 128), 128)
    pts = jnp.transpose(points_xyz.astype(jnp.float32))
    penalty = jnp.where(valid, 0.0, np.float32(1e30)).reshape(1, P)
    if Pp != P:
        pts = jnp.pad(pts, ((0, 0), (0, Pp - P)))
        penalty = jnp.pad(penalty, ((0, 0), (0, Pp - P)),
                          constant_values=np.float32(1e30))
    return pts, penalty, Pp


def _idw_kernel(gp_ref, pts_ref, vals_ref, penalty_ref, out_ref, *,
                k: int, rho: float, tau: float):
    """One grid block. gp_ref: (3, Q_BLK); pts/vals/penalty: (3, P)/(1, P)."""
    P = pts_ref.shape[1]
    qblk = gp_ref.shape[1]

    gx = gp_ref[0, :].reshape(qblk, 1)
    gy = gp_ref[1, :].reshape(qblk, 1)
    gz = gp_ref[2, :].reshape(qblk, 1)
    px = pts_ref[0, :].reshape(1, P)
    py = pts_ref[1, :].reshape(1, P)
    pz = pts_ref[2, :].reshape(1, P)

    dx = gx - px
    dy = gy - py
    dz = gz - pz
    d2 = dx * dx + dy * dy + dz * dz + penalty_ref[0, :].reshape(1, P)
    # select on the f32 SQRT distance, not d2: sqrt collapses ULP-near d2
    # pairs into exact ties, and the reference (torch cdist -> topk, like
    # the XLA fallback) selects in that collapsed metric — selecting on d2
    # flips the k-th neighbour at such pixels
    d = jnp.sqrt(d2)

    vals = vals_ref[0, :].reshape(1, P)
    col = jax.lax.broadcasted_iota(jnp.int32, (qblk, P), 1)
    inf = jnp.float32(np.inf)

    w_sum = jnp.zeros((qblk, 1), jnp.float32)
    wv_sum = jnp.zeros((qblk, 1), jnp.float32)
    for _ in range(k):
        d_min = jnp.min(d, axis=1, keepdims=True)
        hit = col == _first_min_col(d, d_min, col)
        v_min = jnp.sum(jnp.where(hit, vals, 0.0), axis=1, keepdims=True)
        w = _weight_from_d(d_min, rho, tau)
        w_sum = w_sum + w
        wv_sum = wv_sum + w * v_min
        d = jnp.where(hit, inf, d)

    out_ref[0, :] = (wv_sum / (w_sum + 1e-12)).reshape(qblk)


# Above this candidate count the single-pass kernel's (q_block, P) VMEM tile
# overflows Mosaic's 16 MB scoped-VMEM stack (measured on v5e: P=16000 at
# q_block=512 allocates 36 MB and fails); the two-level chunked path takes
# over. 4096 keeps the single-pass tile at ~8.4 MB with margin.
_P_SINGLE_PASS_MAX = 4096
# Chunked-path tile: (q_block, p_chunk) intermediates must fit Mosaic's 16 MB
# scoped-VMEM stack (measured: 512x8192 f32 tiles hit 18.8 MB and fail).
# Tile sweep on chip at P=77824, (16,128,128) grid: (256,2048) 404 ms,
# (512,2048) 410 ms, (256,4096) 254 ms, (128,4096) 209 ms/fwd; (128,8192)
# stalls in compile. Wide candidate tiles amortize the per-round reduction
# setup; the narrow q_block keeps the stack within budget.
_P_CHUNK = 4096
_Q_BLOCK_CHUNKED = 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def idw_3d_knn_pallas(points_xyz: jax.Array, values: jax.Array, valid: jax.Array,
                      out_shape: Tuple[int, int, int], k: int = 4,
                      rho: float = 2.0, tau: float = 0.05,
                      q_block: int = 512) -> jax.Array:
    """Drop-in for ``ops.idw.idw_3d_knn`` running as a fused Pallas kernel."""
    return _idw_forward(points_xyz, values, valid, out_shape, k, rho, tau, q_block)


def _idw_forward(points_xyz, values, valid, out_shape, k, rho, tau, q_block):
    if points_xyz.shape[0] > _P_SINGLE_PASS_MAX:
        out, _ = _idw_forward_chunked(points_xyz, values, valid, out_shape,
                                      k, rho, tau, q_block)
        return out
    return _idw_forward_single(points_xyz, values, valid, out_shape, k, rho,
                               tau, q_block)


def _idw_forward_single(points_xyz, values, valid, out_shape, k, rho, tau, q_block):
    D, H, W = out_shape
    gp = np.ascontiguousarray(grid_points(D, H, W).T)  # (3, Q)
    Q = gp.shape[1]
    Qp = round_up(Q, q_block)
    if Qp != Q:
        gp = np.pad(gp, ((0, 0), (0, Qp - Q)))
    P = points_xyz.shape[0]
    pts, penalty, Pp = _prep_points(points_xyz, valid)
    vals = values.astype(jnp.float32).reshape(1, P)
    if Pp != P:
        vals = jnp.pad(vals, ((0, 0), (0, Pp - P)))

    out = pl.pallas_call(
        functools.partial(_idw_kernel, k=k, rho=rho, tau=tau),
        grid=(Qp // q_block,),
        in_specs=[
            pl.BlockSpec((3, q_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Qp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=Qp * Pp * (9 + 6 * k), bytes_accessed=4 * (3 * Qp + 5 * Pp + Qp),
            transcendentals=Qp * Pp,  # the selection-metric tile sqrt
        ),
    )(jnp.asarray(gp), pts, vals, penalty)
    return out[0, :Q].reshape(D, H, W)


def _idw_topk_chunk_kernel(gp_ref, pts_ref, penalty_ref, d_ref, idx_ref, *,
                           k: int, p_chunk: int):
    """Local top-k for one (query block, candidate chunk) grid cell.

    Emits the chunk's k nearest f32 sqrt distances and their GLOBAL
    candidate indices; the exact global top-k is recovered outside by a
    lexicographic (d, idx) merge over the per-chunk winners (global top-k
    is always a subset of the union of chunk top-ks). VMEM holds only a
    (q_block, p_chunk) tile, so any candidate count compiles.
    """
    j = pl.program_id(1)
    P = pts_ref.shape[1]
    qblk = gp_ref.shape[1]

    gx = gp_ref[0, :].reshape(qblk, 1)
    gy = gp_ref[1, :].reshape(qblk, 1)
    gz = gp_ref[2, :].reshape(qblk, 1)
    px = pts_ref[0, :].reshape(1, P)
    py = pts_ref[1, :].reshape(1, P)
    pz = pts_ref[2, :].reshape(1, P)
    dx = gx - px
    dy = gy - py
    dz = gz - pz
    d2 = dx * dx + dy * dy + dz * dz + penalty_ref[0, :].reshape(1, P)
    # select (and emit) the f32 sqrt distance — reference-collapsed ties
    d = jnp.sqrt(d2)

    col = jax.lax.broadcasted_iota(jnp.int32, (qblk, P), 1)
    inf = jnp.float32(np.inf)
    base = j * p_chunk
    for r in range(k):
        d_min = jnp.min(d, axis=1, keepdims=True)
        idx = _first_min_col(d, d_min, col)
        hit = col == idx
        d_ref[0, r, :] = d_min.reshape(qblk)
        idx_ref[0, r, :] = (idx + base).reshape(qblk)
        d = jnp.where(hit, inf, d)


def _idw_forward_chunked(points_xyz, values, valid, out_shape, k, rho, tau,
                         q_block):
    """(out (D,H,W), (sel_idx (Q,k), w_norm (Q,k))) for large candidate sets.

    Phase A (Pallas): per-chunk local top-k over a (q_blocks, p_chunks) grid.
    Phase B (XLA, tiny (Q, chunks*k) arrays): exact merge under the same
    explicit lowest-index tie order the in-chunk rounds apply — min sqrt
    distance first, ties by lowest global candidate index — then IDW weights and the
    value gather. The
    selected indices/weights are returned so the VJP is an exact scatter of
    the forward's own selection (no recompute, no tie drift).
    """
    D, H, W = out_shape
    q_block = min(q_block, _Q_BLOCK_CHUNKED)
    gp = np.ascontiguousarray(grid_points(D, H, W).T)  # (3, Q)
    Q = gp.shape[1]
    Qp = round_up(Q, q_block)
    if Qp != Q:
        gp = np.pad(gp, ((0, 0), (0, Qp - Q)))
    P = points_xyz.shape[0]
    pts, penalty, Pp = _prep_points(points_xyz, valid)
    p_chunk = _P_CHUNK
    Pc = round_up(Pp, p_chunk)
    if Pc != Pp:
        pts = jnp.pad(pts, ((0, 0), (0, Pc - Pp)))
        penalty = jnp.pad(penalty, ((0, 0), (0, Pc - Pp)),
                          constant_values=np.float32(1e30))
    vals = values.astype(jnp.float32)
    if Pc != P:
        vals = jnp.pad(vals, (0, Pc - P))
    n_qblk, n_pchunk = Qp // q_block, Pc // p_chunk

    dc, idxc = pl.pallas_call(
        functools.partial(_idw_topk_chunk_kernel, k=k, p_chunk=p_chunk),
        grid=(n_qblk, n_pchunk),
        in_specs=[
            pl.BlockSpec((3, q_block), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, p_chunk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_chunk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k, q_block), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, q_block), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((n_pchunk, k, Qp), jnp.float32),
                   jax.ShapeDtypeStruct((n_pchunk, k, Qp), jnp.int32)),
        cost_estimate=pl.CostEstimate(
            flops=Qp * Pc * (9 + 3 * k),
            bytes_accessed=4 * (3 * Qp + 4 * Pc + 2 * k * Qp * n_pchunk),
            transcendentals=Qp * Pc,  # selection-metric sqrt
        ),
    )(jnp.asarray(gp), pts, penalty)

    # (n_pchunk, k, Qp) -> (Q, C) candidate tables, C = n_pchunk * k
    dt = dc.reshape(n_pchunk * k, Qp).T[:Q]
    idxt = idxc.reshape(n_pchunk * k, Qp).T[:Q]

    inf = jnp.float32(np.inf)
    w_sum = jnp.zeros((Q, 1), jnp.float32)
    wv_sum = jnp.zeros((Q, 1), jnp.float32)
    sel_idx = []
    sel_w = []
    for _ in range(k):
        m = jnp.min(dt, axis=1, keepdims=True)
        tied = dt == m
        # lowest GLOBAL candidate index wins ties — the same explicit rule
        # the in-chunk kernel rounds now apply (_first_min_col), so the
        # merged selection is bit-consistent with the single-pass kernel
        # AND with the XLA/torch-reference first-index order
        big_i = jnp.int32(np.iinfo(np.int32).max)
        sel = jnp.min(jnp.where(tied, idxt, big_i), axis=1, keepdims=True)
        dt = jnp.where(tied & (idxt == sel), inf, dt)
        w = _weight_from_d(m, rho, tau)
        w_sum = w_sum + w
        wv_sum = wv_sum + w * vals[sel[:, 0]][:, None]
        sel_idx.append(sel)
        sel_w.append(w)
    out = (wv_sum / (w_sum + 1e-12)).reshape(D, H, W)
    sel_idx = jnp.concatenate(sel_idx, axis=1)                    # (Q, k)
    w_norm = jnp.concatenate(sel_w, axis=1) / (w_sum + 1e-12)     # (Q, k)
    return out, (sel_idx, w_norm)


def _idw_bwd_kernel(gp_ref, pts_ref, penalty_ref, g_ref, dv_ref, *,
                    k: int, rho: float, tau: float):
    """d_values partial for one grid block: (1, P), summed outside.

    The selection weights depend only on geometry (points/grid/validity),
    so the backward needs no value residuals: pass 1 re-runs the k argmin
    rounds for the weight sum, pass 2 re-runs them scattering each selected
    candidate's normalized weight x cotangent into its point column. Same
    arithmetic as the forward kernel, so the gradient is consistent with
    the compiled forward's selection even at distance ties (the old XLA
    backward recomputed selection with different arithmetic AND pushed
    (Q, P) distance/cotangent tensors through HBM).
    """
    P = pts_ref.shape[1]
    qblk = gp_ref.shape[1]

    gx = gp_ref[0, :].reshape(qblk, 1)
    gy = gp_ref[1, :].reshape(qblk, 1)
    gz = gp_ref[2, :].reshape(qblk, 1)
    px = pts_ref[0, :].reshape(1, P)
    py = pts_ref[1, :].reshape(1, P)
    pz = pts_ref[2, :].reshape(1, P)
    dx = gx - px
    dy = gy - py
    dz = gz - pz
    d2 = dx * dx + dy * dy + dz * dz + penalty_ref[0, :].reshape(1, P)
    d = jnp.sqrt(d2)  # same collapsed selection metric as the forward

    g = g_ref[0, :].reshape(qblk, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (qblk, P), 1)
    inf = jnp.float32(np.inf)

    da = d
    w_sum = jnp.zeros((qblk, 1), jnp.float32)
    for _ in range(k):
        d_min = jnp.min(da, axis=1, keepdims=True)
        hit = col == _first_min_col(da, d_min, col)
        w_sum = w_sum + _weight_from_d(d_min, rho, tau)
        da = jnp.where(hit, inf, da)

    scale = g / (w_sum + 1e-12)              # (qblk, 1)
    dv = jnp.zeros((1, P), jnp.float32)
    for _ in range(k):
        d_min = jnp.min(d, axis=1, keepdims=True)
        hit = col == _first_min_col(d, d_min, col)
        w = _weight_from_d(d_min, rho, tau)
        dv = dv + jnp.sum(jnp.where(hit, w * scale, 0.0), axis=0,
                          keepdims=True)
        d = jnp.where(hit, inf, d)

    dv_ref[0, 0, :] = dv.reshape(P)


@functools.partial(jax.jit, static_argnames=("out_shape", "k", "rho", "tau",
                                              "q_block"))
def idw_3d_knn_bwd_pallas(points_xyz, valid, g, out_shape, k=4, rho=2.0,
                          tau=0.05, q_block=512):
    """d_values of ``idw_3d_knn_pallas`` w.r.t. ``values``. g: (D, H, W)."""
    D, H, W = out_shape
    gp = np.ascontiguousarray(grid_points(D, H, W).T)  # (3, Q)
    Q = gp.shape[1]
    Qp = round_up(Q, q_block)
    gflat = g.astype(jnp.float32).reshape(1, Q)
    if Qp != Q:
        gp = np.pad(gp, ((0, 0), (0, Qp - Q)))
        gflat = jnp.pad(gflat, ((0, 0), (0, Qp - Q)))  # zero cotangent
    P = points_xyz.shape[0]
    pts, penalty, Pp = _prep_points(points_xyz, valid)
    nblk = Qp // q_block

    parts = pl.pallas_call(
        functools.partial(_idw_bwd_kernel, k=k, rho=rho, tau=tau),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((3, q_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        # (nblk, 1, Pp) so the block's trailing two dims (1, Pp) equal the
        # array dims — Mosaic's block-shape alignment rule
        out_specs=pl.BlockSpec((1, 1, Pp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, 1, Pp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=Qp * Pp * (9 + 12 * k),
            bytes_accessed=4 * (4 * Qp + 4 * Pp + nblk * Pp),
            transcendentals=Qp * Pp,  # selection-metric sqrt
        ),
    )(jnp.asarray(gp), pts, penalty, gflat)
    return jnp.sum(parts, axis=(0, 1))[:P]


def _idw_fwd(points_xyz, values, valid, out_shape, k, rho, tau, q_block):
    if points_xyz.shape[0] > _P_SINGLE_PASS_MAX:
        out, (sel_idx, w_norm) = _idw_forward_chunked(
            points_xyz, values, valid, out_shape, k, rho, tau, q_block)
        return out, (points_xyz, valid, (sel_idx, w_norm))
    out = _idw_forward_single(points_xyz, values, valid, out_shape, k, rho,
                              tau, q_block)
    return out, (points_xyz, valid, None)


def _idw_bwd(out_shape, k, rho, tau, q_block, residuals, g):
    """Pallas backward producing d_values directly.

    Gradients are defined w.r.t. ``values`` only: ``points_xyz`` are fixed
    mask-derived geometry, never on a differentiable path, and receive zero
    cotangents (the old XLA-vjp backward computed a real d_points chain
    that XLA dead-code-eliminated — after materializing (Q, P) candidate
    tensors in HBM)."""
    points_xyz, valid, chunk_res = residuals
    if chunk_res is not None:
        # chunked path: the forward already returned its own selection
        # (indices + normalized weights), so d_values is an exact scatter —
        # by construction tie-consistent with the compiled forward.
        sel_idx, w_norm = chunk_res
        P = points_xyz.shape[0]
        Pc = round_up(round_up(max(P, 128), 128), _P_CHUNK)
        g_flat = g.astype(jnp.float32).reshape(-1, 1)      # (Q, 1)
        dv = jnp.zeros((Pc,), jnp.float32).at[sel_idx].add(
            w_norm * g_flat, mode="drop")[:P]
        return jnp.zeros_like(points_xyz), dv, None
    dv = idw_3d_knn_bwd_pallas(points_xyz, valid, g, out_shape, k=k, rho=rho,
                               tau=tau, q_block=q_block)
    return jnp.zeros_like(points_xyz), dv, None


idw_3d_knn_pallas.defvjp(_idw_fwd, _idw_bwd)
