"""Pallas kernel for the factorized IDW candidate-combine stage.

The XLA version of ``ops.idw.idw_3d_factored``'s combine loop makes ~20
HBM passes over the (HW, D*k) candidate tensors (each reduction breaks
fusion). This kernel reads each tile once — gauge distances (k, HW_BLK),
candidate values (D*k, HW_BLK) and the tiny frame-distance table — builds
the (D*k, HW_BLK) candidate matrix in VMEM and runs all k extraction rounds
in registers, writing only the (1, HW_BLK) result row.

Candidate order is frame-major (f*k + slot, slots in ascending pixel order),
so argmin's lowest-index tie-break reproduces the reference's flat nonzero
order exactly, as in the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..idw import round_up
from .select import first_min_index

BIGD = np.float32(1e15)  # sqrt(1e30) sentinel for invalid candidates


def _frame_selection(D: int, k: int, tie_eps: float = 1e-5):
    """Static per-query-z frame pruning (exact): the global top-k can hold at
    most k candidates of one gauge, and per gauge the candidate order across
    frames is the frame-distance order — so only each z's nearest frames can
    ever be selected. Two subtleties make the set slightly bigger than k:

    * symmetric +-z frames have ULP-different dz^2 (mixed linspace vs
      idx/(D-1) normalizations) that COLLAPSE to equal f32 distances after
      ``sqrt(g + dz^2)`` — the f32 comparison then tie-breaks to the LOWER
      frame index, which may be the numerically-farther one. Every frame
      within ``tie_eps`` (absolute, >> ULP collapse scale ~1e-6, << the
      4e-3 gap between distinct distance levels at D>=16) of the k-th
      nearest is therefore kept;
    * all z share one kf so the kernel is uniform — shorter rows pad with
      the next-nearest frames (harmless supersets).

    Selected frames are in ascending index order so argmin's lowest-index
    tie-break stays the reference's flat frame-major nonzero order.
    Returns (sel (D, kf) frame ids, kf)."""
    from ..idw import frame_dz2_np

    fd = frame_dz2_np(D).astype(np.float64)
    orders = [np.argsort(fd[z], kind="stable") for z in range(D)]
    keep = []
    for z in range(D):
        kth = fd[z][orders[z][min(k, D) - 1]]
        keep.append({int(f) for f in range(D) if fd[z][f] <= kth + tie_eps})
    kf = min(max(max(len(s) for s in keep), k), D)
    sel = []
    for z in range(D):
        s = keep[z]
        for f in orders[z]:
            if len(s) >= kf:
                break
            s.add(int(f))
        sel.append(np.sort(np.fromiter(s, dtype=np.int32)))
    return np.stack(sel).astype(np.int32), kf


def _idw_weight(d_min: jax.Array, rho: float, tau: float) -> jax.Array:
    """Selected-candidate IDW weight ``1/(d+tau)^rho``; zero at the BIGD
    sentinel (invalid/already-extracted candidates). Shared by the forward
    and backward kernels so their selection arithmetic stays identical."""
    if abs(rho - 2.0) < 1e-6:
        invd = 1.0 / (d_min + tau)
        w = invd * invd
    else:
        w = 1.0 / jnp.power(d_min + tau, rho)
    return jnp.where(d_min < BIGD, w, 0.0)


def _first_min_row(cd, d_min, row):
    """Lowest-index candidate row attaining the per-lane minimum (explicit
    tie-break, see ops/pallas/select.py for the rationale)."""
    return first_min_index(cd, d_min[None, :], row, axis=0)


def _selection_weights(gd2_tiled: jax.Array, fz: jax.Array, row: jax.Array,
                       k: int, rho: float, tau: float):
    """One query-z extraction pass: the k min/argmin rounds over the
    frame-major candidate distance matrix ``sqrt(gd2_tiled + fz)``,
    returning each candidate row's SELECTED weight and the weight sum
    (wsel (kf*k, B), w_sum (B,)). Shared by the multi-window forward and
    both backward kernels so the tie-sensitive selection arithmetic exists
    exactly once; the single-window forwards keep their documented
    per-round value accumulation (reference reduction order) inline."""
    cd = jnp.sqrt(gd2_tiled + fz)
    cd = jnp.where(cd < BIGD, cd, BIGD)
    wsel = jnp.zeros(cd.shape, jnp.float32)
    w_sum = jnp.zeros((cd.shape[1],), jnp.float32)
    for _ in range(k):
        d_min = jnp.min(cd, axis=0)
        hit = row == _first_min_row(cd, d_min, row)[None, :]
        w = _idw_weight(d_min, rho, tau)
        w_sum = w_sum + w
        wsel = wsel + jnp.where(hit, w[None, :], 0.0)
        cd = jnp.where(hit, BIGD, cd)
    return wsel, w_sum


def _accumulate_values(cv: jax.Array, gd2_tiled: jax.Array, fz: jax.Array,
                       row: jax.Array, k: int, rho: float, tau: float):
    """One query-z extraction with the reference's PER-ROUND value
    accumulation (wv_sum += w*v each of the k rounds — not the multi-window
    kernel's reassociated wnorm·v). Shared by the two single-window forward
    kernels so their tie-sensitive selection arithmetic exists exactly once;
    returns the (B,) combined value row."""
    cd = jnp.sqrt(gd2_tiled + fz)
    cd = jnp.where(cd < BIGD, cd, BIGD)
    w_sum = jnp.zeros((cd.shape[1],), jnp.float32)
    wv_sum = jnp.zeros((cd.shape[1],), jnp.float32)
    for _ in range(k):
        d_min = jnp.min(cd, axis=0)
        hit = row == _first_min_row(cd, d_min, row)[None, :]
        v = jnp.sum(jnp.where(hit, cv, 0.0), axis=0)
        w = _idw_weight(d_min, rho, tau)
        w_sum = w_sum + w
        wv_sum = wv_sum + w * v
        cd = jnp.where(hit, BIGD, cd)
    return wv_sum / (w_sum + 1e-12)


def _route_table(sel, kf: int) -> np.ndarray:
    """(D, D, kf) 0/1 routing input for the backward kernels: frame f of
    candidate row j*k+s under query z is sel[z][j]."""
    D = len(sel)
    route = np.zeros((D, D, kf), np.float32)
    for z in range(D):
        for j, f in enumerate(sel[z]):
            route[z, int(f), j] = 1.0
    return route


def _pruned_frame_table(dz2: jax.Array, D: int, k: int, prune: bool):
    """(sel, kf, fd2): static per-z frame selection + the (D, kf*k) pruned
    frame-distance table, frame-major candidate row order."""
    if prune:
        sel, kf = _frame_selection(D, k)
    else:  # full frame-major candidate set (pruning-equivalence testing)
        sel = np.tile(np.arange(D, dtype=np.int32), (D, 1))
        kf = D
    fd2 = jnp.repeat(jnp.take_along_axis(dz2, jnp.asarray(sel), axis=1),
                     k, axis=1)
    return sel, kf, fd2


def _combine_kernel(gd2_ref, cvals_ref, fd2_ref, out_ref, *, k: int, D: int,
                    rho: float, tau: float, sel: tuple):
    """gd2: (k, B); cvals: (D*k, B); fd2: (D, kf*k); out: (D, B).

    One program handles every query-z row for its pixel block, so the gauge
    distances and candidate values are loaded into VMEM once and reused D
    times. Per z only the kf=min(k,D) nearest frames' candidates compete
    (see _frame_selection) — 4x fewer compare/select rounds than the full
    frame-major matrix at D=16, k=4.
    """
    B = gd2_ref.shape[1]
    kf = len(sel[0])
    gd2 = gd2_ref[...]                       # (k, B)
    gd2_tiled = jnp.concatenate([gd2] * kf, axis=0)  # (kf*k, B) frame-major
    cvals = cvals_ref[...]                   # (D*k, B)
    row = jax.lax.broadcasted_iota(jnp.int32, (kf * k, B), 0)

    fd2 = fd2_ref[...]                       # (D, kf*k) pruned, loaded once

    for z in range(D):
        cv = jnp.concatenate(
            [cvals[f * k:(f + 1) * k] for f in sel[z]], axis=0)  # (kf*k, B)
        fz = fd2[z].reshape(kf * k, 1)
        out_ref[z, :] = _accumulate_values(cv, gd2_tiled, fz, row, k, rho, tau)


@functools.partial(jax.jit, static_argnames=("k", "D", "rho", "tau",
                                              "hw_block", "prune"))
def factored_combine_pallas(gd2_t: jax.Array,    # (k, HW) gauge dists^2
                            cvals_t: jax.Array,  # (D*k, HW) candidate values
                            dz2: jax.Array,      # (D, D) frame dists^2
                            k: int, D: int, rho: float = 2.0, tau: float = 0.05,
                            hw_block: int = 512, prune: bool = True) -> jax.Array:
    HW = gd2_t.shape[1]
    HWp = round_up(HW, hw_block)
    if HWp != HW:
        gd2_t = jnp.pad(gd2_t, ((0, 0), (0, HWp - HW)), constant_values=1e30)
        cvals_t = jnp.pad(cvals_t, ((0, 0), (0, HWp - HW)))
    sel, kf, dz2 = _pruned_frame_table(dz2, D, k, prune)

    out = pl.pallas_call(
        functools.partial(_combine_kernel, k=k, D=D, rho=rho, tau=tau,
                          sel=tuple(tuple(int(f) for f in row) for row in sel)),
        grid=(HWp // hw_block,),
        in_specs=[
            pl.BlockSpec((k, hw_block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D * k, hw_block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, kf * k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, hw_block), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, HWp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=D * HWp * kf * k * 8, bytes_accessed=4 * HWp * (k + D * k + D),
            transcendentals=D * HWp * k,
        ),
    )(gd2_t, cvals_t, dz2)
    return out[:, :HW]


def _combine_table_kernel(gd2_ref, gsel_ref, table_ref, fd2_ref, out_ref, *,
                          k: int, D: int, rho: float, tau: float, sel: tuple):
    """Combine with IN-KERNEL candidate gather from the (D, G) gauge table.

    gd2: (k, B); gsel: (k, B) int32 gauge-slot ids; table: (D, G) values at
    gauges; fd2: (D, kf*k); out: (D, B). The per-pixel candidate values are
    materialized as k one-hot (G, B) matmuls against the VMEM-resident table
    (MXU work, ~0.3 GFLOP/window-batch) instead of an XLA gather that wrote
    a (HW*k, WB, D) tensor through HBM (~1.8 ms/event in the trace:
    fusion.391 + its relayout copy).
    """
    B = gd2_ref.shape[1]
    kf = len(sel[0])
    gd2 = gd2_ref[...]                       # (k, B)
    gsel = gsel_ref[...]                     # (k, B) i32
    table = table_ref[...]                   # (D, G)
    G = table.shape[1]

    giota = jax.lax.broadcasted_iota(jnp.int32, (G, B), 0)
    slot_vals = []
    for s in range(k):
        onehot = (giota == gsel[s][None, :]).astype(table.dtype)  # (G, B)
        slot_vals.append(jnp.dot(table, onehot,
                                 preferred_element_type=jnp.float32))  # (D, B)
    # frame-major candidate rows (f*k + s), as the flat nonzero order demands
    cvals = jnp.stack(slot_vals, axis=1).reshape(D * k, B)

    gd2_tiled = jnp.concatenate([gd2] * kf, axis=0)  # (kf*k, B)
    row = jax.lax.broadcasted_iota(jnp.int32, (kf * k, B), 0)
    fd2 = fd2_ref[...]                       # (D, kf*k)

    for z in range(D):
        cv = jnp.concatenate(
            [cvals[f * k:(f + 1) * k] for f in sel[z]], axis=0)
        fz = fd2[z].reshape(kf * k, 1)
        out_ref[z, :] = _accumulate_values(cv, gd2_tiled, fz, row, k, rho, tau)


@functools.partial(jax.jit, static_argnames=("k", "D", "rho", "tau",
                                              "hw_block", "prune"))
def factored_combine_table_pallas(gd2_t: jax.Array,   # (k, HW)
                                  gsel_t: jax.Array,  # (k, HW) int32
                                  table: jax.Array,   # (D, G)
                                  dz2: jax.Array,     # (D, D)
                                  k: int, D: int, rho: float = 2.0,
                                  tau: float = 0.05, hw_block: int = 512,
                                  prune: bool = True) -> jax.Array:
    HW = gd2_t.shape[1]
    G = table.shape[1]
    HWp = round_up(HW, hw_block)
    if HWp != HW:
        gd2_t = jnp.pad(gd2_t, ((0, 0), (0, HWp - HW)), constant_values=1e30)
        gsel_t = jnp.pad(gsel_t, ((0, 0), (0, HWp - HW)))
    sel, kf, dz2 = _pruned_frame_table(dz2, D, k, prune)

    out = pl.pallas_call(
        functools.partial(_combine_table_kernel, k=k, D=D, rho=rho, tau=tau,
                          sel=tuple(tuple(int(f) for f in row) for row in sel)),
        grid=(HWp // hw_block,),
        in_specs=[
            pl.BlockSpec((k, hw_block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, hw_block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, G), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, kf * k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, hw_block), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, HWp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=D * HWp * kf * k * 8 + HWp * k * G * D * 2,
            bytes_accessed=4 * HWp * (2 * k + D) + 4 * D * G,
            transcendentals=D * HWp * k,
        ),
    )(gd2_t, gsel_t, table, dz2)
    return out[:, :HW]


def _combine_table_multi_kernel(gd2_ref, gsel_ref, tables_ref, fd2_ref,
                                out_ref, *, k: int, D: int, rho: float,
                                tau: float, sel: tuple):
    """Combine for NW windows sharing ONE mask in a single kernel pass.

    gd2: (k, B); gsel: (k, B); tables: (NW, D, G); fd2: (D, kf*k);
    out: (NW, D, B). The candidate *selection* (distances, k extraction
    rounds, weight normalization) depends only on mask geometry, so the
    vmapped single-window kernel recomputed it NW times per chunk — the
    dominant VPU cost (PROFILE.md round-2 trace: 1.07 ms per 8-window call).
    Here the extraction runs once per (z, pixel block), producing the
    normalized per-candidate weight row ``wnorm``, and every window reduces
    its candidate values against it. Arithmetic per window is identical to
    the single-window kernel up to the final reduction order (sum over
    candidate rows of wnorm*v instead of per-round accumulation of
    (w/w_sum)*v — same selected weights, reassociated sum)."""
    B = gd2_ref.shape[1]
    kf = len(sel[0])
    NW = tables_ref.shape[0]
    gd2 = gd2_ref[...]                       # (k, B)
    gsel = gsel_ref[...]                     # (k, B) i32
    tables = tables_ref[...]                 # (NW, D, G)
    G = tables.shape[2]

    # candidate values for ALL windows at once: k one-hot (G, B) matmuls
    # against the stacked (NW*D, G) tables
    giota = jax.lax.broadcasted_iota(jnp.int32, (G, B), 0)
    flat_tables = tables.reshape(NW * D, G)
    slot_vals = []
    for s in range(k):
        onehot = (giota == gsel[s][None, :]).astype(tables.dtype)  # (G, B)
        slot_vals.append(jnp.dot(flat_tables, onehot,
                                 preferred_element_type=jnp.float32)
                         .reshape(NW, D, B))
    # frame-major candidate rows per window: cv[w, f*k+s] = slot_vals[s][w, f]
    cv_all = jnp.stack(slot_vals, axis=2).reshape(NW, D * k, B)

    gd2_tiled = jnp.concatenate([gd2] * kf, axis=0)  # (kf*k, B)
    row = jax.lax.broadcasted_iota(jnp.int32, (kf * k, B), 0)
    fd2 = fd2_ref[...]                       # (D, kf*k)

    for z in range(D):
        fz = fd2[z].reshape(kf * k, 1)
        wsel, w_sum = _selection_weights(gd2_tiled, fz, row, k, rho, tau)
        wnorm = wsel / (w_sum + 1e-12)[None, :]          # (kf*k, B)
        for w_i in range(NW):
            cv = jnp.concatenate(
                [cv_all[w_i, f * k:(f + 1) * k] for f in sel[z]], axis=0)
            out_ref[w_i, z, :] = jnp.sum(wnorm * cv, axis=0)


@functools.partial(jax.jit, static_argnames=("k", "D", "rho", "tau",
                                              "hw_block", "prune"))
def factored_combine_table_multi_pallas(gd2_t: jax.Array,   # (k, HW)
                                        gsel_t: jax.Array,  # (k, HW) int32
                                        tables: jax.Array,  # (NW, D, G)
                                        dz2: jax.Array,     # (D, D)
                                        k: int, D: int, rho: float = 2.0,
                                        tau: float = 0.05, hw_block: int = 512,
                                        prune: bool = True) -> jax.Array:
    """(NW, D, HW) combine of NW same-mask windows in one selection pass."""
    HW = gd2_t.shape[1]
    NW, _, G = tables.shape
    HWp = round_up(HW, hw_block)
    if HWp != HW:
        gd2_t = jnp.pad(gd2_t, ((0, 0), (0, HWp - HW)), constant_values=1e30)
        gsel_t = jnp.pad(gsel_t, ((0, 0), (0, HWp - HW)))
    sel, kf, dz2 = _pruned_frame_table(dz2, D, k, prune)

    out = pl.pallas_call(
        functools.partial(_combine_table_multi_kernel, k=k, D=D, rho=rho,
                          tau=tau,
                          sel=tuple(tuple(int(f) for f in row) for row in sel)),
        grid=(HWp // hw_block,),
        in_specs=[
            pl.BlockSpec((k, hw_block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, hw_block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NW, D, G), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, kf * k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NW, D, hw_block), lambda j: (0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NW, D, HWp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=D * HWp * kf * k * (6 + 2 * NW) + HWp * k * G * NW * D * 2,
            bytes_accessed=4 * HWp * (2 * k + NW * D) + 4 * NW * D * G,
            transcendentals=D * HWp * k,
        ),
    )(gd2_t, gsel_t, tables, dz2)
    return out[:, :, :HW]


def _combine_table_bwd_kernel(gd2_ref, gsel_ref, fd2_ref, g_ref, route_ref,
                              dtab_ref, *, k: int, D: int, kf: int,
                              rho: float, tau: float):
    """d_table for one pixel block: (1, D, G) partial, summed outside.

    The selection weights depend only on geometry (gd2/fd2), not on the
    table values, so the backward needs no residual values: re-run the k
    extraction rounds per query z collecting each candidate's SELECTED
    weight, normalize by the final weight sum, multiply by the output
    cotangent, route candidate rows to their frames with a static (D, kf)
    0/1 matmul, and scatter to gauge columns with the same one-hot matmul
    trick as the forward gather. Replaces an XLA backward that re-ran the
    chunked combine VJP through HBM-resident (HW, D*k) candidate
    cotangents + a (HW*k, D) scatter-add (~14 ms of a 70 ms GAN step,
    PROFILE.md per-op trace).
    """
    B = gd2_ref.shape[1]
    gd2 = gd2_ref[...]                       # (k, B)
    gsel = gsel_ref[...]                     # (k, B) i32
    g = g_ref[...]                           # (D, B) cotangent
    G = dtab_ref.shape[2]

    gd2_tiled = jnp.concatenate([gd2] * kf, axis=0)  # (kf*k, B)
    row = jax.lax.broadcasted_iota(jnp.int32, (kf * k, B), 0)
    fd2 = fd2_ref[...]                       # (D, kf*k)
    route = route_ref[...]                   # (D, D, kf) 0/1 routing input

    X = [jnp.zeros((D, B), jnp.float32) for _ in range(k)]  # per-slot routed
    for z in range(D):
        fz = fd2[z].reshape(kf * k, 1)
        wsel, w_sum = _selection_weights(gd2_tiled, fz, row, k, rho, tau)
        wg = (wsel / (w_sum + 1e-12)[None, :]) * g[z][None, :]  # (kf*k, B)
        wg = wg.reshape(kf, k, B)
        rz = route[z]                        # (D, kf) 0/1
        for s in range(k):
            X[s] = X[s] + jax.lax.dot_general(
                rz, wg[:, s, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    giota = jax.lax.broadcasted_iota(jnp.int32, (B, G), 1)
    acc = jnp.zeros((D, G), jnp.float32)
    for s in range(k):
        onehot = (giota == gsel[s][:, None]).astype(jnp.float32)  # (B, G)
        acc = acc + jax.lax.dot_general(X[s], onehot,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dtab_ref[0, :, :] = acc


@functools.partial(jax.jit, static_argnames=("G", "k", "D", "rho", "tau",
                                              "hw_block", "prune"))
def factored_combine_table_bwd_pallas(gd2_t: jax.Array,   # (k, HW)
                                      gsel_t: jax.Array,  # (k, HW) int32
                                      g: jax.Array,       # (D, HW) cotangent
                                      dz2: jax.Array,     # (D, D)
                                      G: int, k: int, D: int,
                                      rho: float = 2.0, tau: float = 0.05,
                                      hw_block: int = 512,
                                      prune: bool = True) -> jax.Array:
    """d_table (D, G) of ``factored_combine_table_pallas`` w.r.t. ``table``."""
    HW = gd2_t.shape[1]
    HWp = round_up(HW, hw_block)
    if HWp != HW:
        # padded pixels get weight 0 (gd2=inf) and cotangent 0 — no effect
        gd2_t = jnp.pad(gd2_t, ((0, 0), (0, HWp - HW)), constant_values=1e30)
        gsel_t = jnp.pad(gsel_t, ((0, 0), (0, HWp - HW)))
        g = jnp.pad(g, ((0, 0), (0, HWp - HW)))
    sel, kf, fd2 = _pruned_frame_table(dz2, D, k, prune)
    nblk = HWp // hw_block
    route = _route_table(sel, kf)

    parts = pl.pallas_call(
        functools.partial(_combine_table_bwd_kernel, k=k, D=D, kf=kf,
                          rho=rho, tau=tau),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((k, hw_block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, hw_block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, kf * k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, hw_block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D, kf), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, G), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, D, G), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=D * HWp * kf * k * 8 + HWp * k * G * D * 2,
            bytes_accessed=4 * HWp * (3 * k + D) + 4 * nblk * D * G,
            transcendentals=D * HWp * k,
        ),
    )(gd2_t, gsel_t, fd2, g, jnp.asarray(route))
    return jnp.sum(parts, axis=0)


def _combine_table_multi_bwd_kernel(gd2_ref, gsel_ref, fd2_ref, g_ref,
                                    route_ref, dtab_ref, *, k: int, D: int,
                                    kf: int, rho: float, tau: float):
    """d_tables for NW same-mask windows: selection weights computed once
    per (z, pixel block) — the multi-window analogue of
    ``_combine_table_bwd_kernel``. g: (NW, D, B); out: (1, NW, D, G) partial.
    Windows stack along the lane axis for the frame-routing matmuls
    ((D, kf) @ (kf, NW*B) per slot) so the matmul count stays k per z."""
    B = gd2_ref.shape[1]
    NW = g_ref.shape[0]
    gd2 = gd2_ref[...]                       # (k, B)
    gsel = gsel_ref[...]                     # (k, B) i32
    g = g_ref[...]                           # (NW, D, B)
    G = dtab_ref.shape[3]

    gd2_tiled = jnp.concatenate([gd2] * kf, axis=0)  # (kf*k, B)
    row = jax.lax.broadcasted_iota(jnp.int32, (kf * k, B), 0)
    fd2 = fd2_ref[...]                       # (D, kf*k)
    route = route_ref[...]                   # (D, D, kf) 0/1 routing input

    X = [jnp.zeros((D, NW * B), jnp.float32) for _ in range(k)]
    for z in range(D):
        fz = fd2[z].reshape(kf * k, 1)
        wsel, w_sum = _selection_weights(gd2_tiled, fz, row, k, rho, tau)
        wnorm = wsel / (w_sum + 1e-12)[None, :]          # (kf*k, B)
        # wg[:, w*B + b] = wnorm[:, b] * g[w, z, b]
        wg = jnp.concatenate([wnorm * g[w_i, z][None, :]
                              for w_i in range(NW)], axis=1)  # (kf*k, NW*B)
        rz = route[z]                        # (D, kf) 0/1
        for s in range(k):
            rows_s = jnp.stack([wg[j * k + s] for j in range(kf)])  # (kf, NW*B)
            X[s] = X[s] + jax.lax.dot_general(
                rz, rows_s, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    giota = jax.lax.broadcasted_iota(jnp.int32, (B, G), 1)
    for w_i in range(NW):
        acc = jnp.zeros((D, G), jnp.float32)
        for s in range(k):
            onehot = (giota == gsel[s][:, None]).astype(jnp.float32)  # (B, G)
            acc = acc + jax.lax.dot_general(
                X[s][:, w_i * B:(w_i + 1) * B], onehot,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dtab_ref[0, w_i, :, :] = acc


@functools.partial(jax.jit, static_argnames=("G", "k", "D", "rho", "tau",
                                              "hw_block", "prune"))
def factored_combine_table_multi_bwd_pallas(gd2_t: jax.Array,   # (k, HW)
                                            gsel_t: jax.Array,  # (k, HW) i32
                                            g: jax.Array,    # (NW, D, HW)
                                            dz2: jax.Array,  # (D, D)
                                            G: int, k: int, D: int,
                                            rho: float = 2.0, tau: float = 0.05,
                                            hw_block: int = 512,
                                            prune: bool = True) -> jax.Array:
    """d_tables (NW, D, G) of ``factored_combine_table_multi_pallas``."""
    HW = gd2_t.shape[1]
    NW = g.shape[0]
    HWp = round_up(HW, hw_block)
    if HWp != HW:
        gd2_t = jnp.pad(gd2_t, ((0, 0), (0, HWp - HW)), constant_values=1e30)
        gsel_t = jnp.pad(gsel_t, ((0, 0), (0, HWp - HW)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, HWp - HW)))
    sel, kf, fd2 = _pruned_frame_table(dz2, D, k, prune)
    nblk = HWp // hw_block
    route = _route_table(sel, kf)

    parts = pl.pallas_call(
        functools.partial(_combine_table_multi_bwd_kernel, k=k, D=D, kf=kf,
                          rho=rho, tau=tau),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((k, hw_block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, hw_block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, kf * k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NW, D, hw_block), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D, kf), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NW, D, G), lambda j: (j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, NW, D, G), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=D * HWp * kf * k * (6 + 2 * NW) + HWp * k * G * NW * D * 2,
            bytes_accessed=4 * HWp * (2 * k + NW * D) + 4 * nblk * NW * D * G,
            transcendentals=D * HWp * k,
        ),
    )(gd2_t, gsel_t, fd2, g, jnp.asarray(route))
    return jnp.sum(parts, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def combine_table_multi_with_vjp(gd2_t, gsel_t, tables, dz2, k, D, rho, tau,
                                 hw_block=512):
    """Multi-window table combine; d_tables via the multi-window Pallas
    backward (selection recomputed once per pixel block, never per window)."""
    return factored_combine_table_multi_pallas(gd2_t, gsel_t, tables, dz2,
                                               k=k, D=D, rho=rho, tau=tau,
                                               hw_block=hw_block)


def _table_multi_fwd(gd2_t, gsel_t, tables, dz2, k, D, rho, tau,
                     hw_block=512):
    out = factored_combine_table_multi_pallas(gd2_t, gsel_t, tables, dz2,
                                              k=k, D=D, rho=rho, tau=tau,
                                              hw_block=hw_block)
    return out, (gd2_t, gsel_t, tables, dz2)


def _table_multi_bwd(k, D, rho, tau, hw_block, residuals, g):
    gd2_t, gsel_t, tables, dz2 = residuals
    d_tables = factored_combine_table_multi_bwd_pallas(
        gd2_t, gsel_t, g, dz2, G=tables.shape[2], k=k, D=D, rho=rho, tau=tau,
        hw_block=hw_block)
    d_gd2 = jnp.zeros_like(gd2_t)
    d_dz2 = jnp.zeros_like(dz2)
    d_gsel = np.zeros(gsel_t.shape, jax.dtypes.float0)
    return d_gd2, d_gsel, d_tables, d_dz2


combine_table_multi_with_vjp.defvjp(_table_multi_fwd, _table_multi_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def combine_table_with_vjp(gd2_t, gsel_t, table, dz2, k, D, rho, tau):
    """Table-gather Pallas forward; backward is a Pallas kernel producing
    ``d_table`` directly (selection weights recomputed in VMEM — they
    depend only on geometry). Gradients are defined w.r.t. ``table`` only:
    ``gd2_t``/``dz2`` are squared distances of fixed pixel/gauge/frame
    geometry, never on a differentiable path, and receive zero cotangents
    (the old XLA backward computed real ``d_gd2``/``d_dz2`` chains that
    XLA then dead-code-eliminated — at the cost of materializing
    (HW, D*k) candidate cotangents in HBM first)."""
    return factored_combine_table_pallas(gd2_t, gsel_t, table, dz2, k=k, D=D,
                                         rho=rho, tau=tau)


def _table_fwd(gd2_t, gsel_t, table, dz2, k, D, rho, tau):
    out = factored_combine_table_pallas(gd2_t, gsel_t, table, dz2, k=k, D=D,
                                        rho=rho, tau=tau)
    return out, (gd2_t, gsel_t, table, dz2)


def _table_bwd(k, D, rho, tau, residuals, g):
    gd2_t, gsel_t, table, dz2 = residuals
    d_table = factored_combine_table_bwd_pallas(gd2_t, gsel_t, g, dz2,
                                                G=table.shape[1], k=k, D=D,
                                                rho=rho, tau=tau)
    d_gd2 = jnp.zeros_like(gd2_t)
    d_dz2 = jnp.zeros_like(dz2)
    d_gsel = np.zeros(gsel_t.shape, jax.dtypes.float0)
    return d_gd2, d_gsel, d_table, d_dz2


combine_table_with_vjp.defvjp(_table_fwd, _table_bwd)


def _gauge_topk_kernel(qx_ref, qy_ref, gx_ref, gy_ref, pen_ref,
                       gd2_ref, gsel_ref, *, k: int):
    """Per-pixel gauge distances + top-k extraction in VMEM.

    qx/qy: (1, B) pixel coords; gx/gy/pen: (G, 1) gauge coords + validity
    penalty. Outputs gd2/gsel: (k, B). Lowest-index tie-break (argmin).
    """
    qx = qx_ref[...]
    qy = qy_ref[...]
    gx = gx_ref[...]
    gy = gy_ref[...]
    dx = qx - gx
    dy = qy - gy
    d = dx * dx + dy * dy + pen_ref[...]     # (G, B)
    G, B = d.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (G, B), 0)
    BIG = jnp.float32(1e30)
    for a in range(k):
        dmin = jnp.min(d, axis=0)
        idx = _first_min_row(d, dmin, row)
        gd2_ref[a, :] = dmin
        gsel_ref[a, :] = idx
        d = jnp.where(row == idx[None, :], BIG, d)


@functools.partial(jax.jit, static_argnames=("k", "hw_block"))
def gauge_topk_pallas(qx: jax.Array, qy: jax.Array, gx: jax.Array,
                      gy: jax.Array, penalty: jax.Array, k: int = 4,
                      hw_block: int = 512):
    """(HW,) pixel coords + (G,) gauge data -> per-pixel top-k gauge
    distances^2 (k, HW) and slot indices (k, HW)."""
    HW = qx.shape[0]
    G = gx.shape[0]
    HWp = round_up(HW, hw_block)
    if HWp != HW:
        qx = jnp.pad(qx, (0, HWp - HW))
        qy = jnp.pad(qy, (0, HWp - HW))
    gd2, gsel = pl.pallas_call(
        functools.partial(_gauge_topk_kernel, k=k),
        grid=(HWp // hw_block,),
        in_specs=[
            pl.BlockSpec((1, hw_block), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw_block), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((k, hw_block), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, hw_block), lambda j: (0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, HWp), jnp.float32),
            jax.ShapeDtypeStruct((k, HWp), jnp.int32),
        ),
    )(qx.reshape(1, HWp), qy.reshape(1, HWp), gx.reshape(G, 1),
      gy.reshape(G, 1), penalty.reshape(G, 1))
    return gd2[:, :HW], gsel[:, :HW]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def combine_with_vjp(gd2_t, cvals_t, dz2, k, D, rho, tau):
    """Pallas forward; backward re-derived from the identical XLA combine."""
    return factored_combine_pallas(gd2_t, cvals_t, dz2, k=k, D=D, rho=rho, tau=tau)


def _fwd(gd2_t, cvals_t, dz2, k, D, rho, tau):
    out = factored_combine_pallas(gd2_t, cvals_t, dz2, k=k, D=D, rho=rho, tau=tau)
    return out, (gd2_t, cvals_t, dz2)


def _bwd(k, D, rho, tau, residuals, g):
    from ..idw import _factored_combine_xla

    gd2_t, cvals_t, dz2 = residuals
    _, vjp = jax.vjp(
        lambda a, b, c: _factored_combine_xla(
            jnp.transpose(a), jnp.transpose(b), c, k, rho, tau),
        gd2_t, cvals_t, dz2)
    return vjp(g)


combine_with_vjp.defvjp(_fwd, _bwd)
