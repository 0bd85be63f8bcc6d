"""Inverse-distance-weighted k-NN scatter — the P2IGAN "point-to-image" op.

Reference semantics: ``p2igan_bench/modules/layer.py:243-361`` — per sample,
the observed (t, y, x) points (normalized to [0,1]^3) are densified onto the
full (D, H, W) grid via k-nearest-neighbour inverse-distance weights
``w = 1/(d + tau)^rho`` (normalized), computed in grid chunks.

TPU-native design: the reference's data-dependent ``nonzero(mask)`` gather and
per-sample Python loop become a **static-shape** pipeline — points are padded
to a static ``max_points`` (invalid slots get +inf distance and hence zero
weight, reproducing the reference's empty-mask => zeros behaviour), the
pairwise distances are a blocked ``(chunk, 3) x (3, P)`` matmul, top-k=4 runs
in-register per chunk, and the whole thing is ``vmap``-ed over the batch and
``lax.map``-ed over grid chunks so XLA pipelines HBM traffic. A fused Pallas
kernel for the distance+top-k stage lives in ``ops/pallas/idw_kernel.py``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def grid_points(D: int, H: int, W: int) -> np.ndarray:
    """(Q, 3) normalized grid coordinates, columns (x, y, z), x fastest.

    Matches reference ``_get_grid_points`` (layer.py:246-256): meshgrid over
    (z, y, x) with ij indexing, stacked as [gx, gy, gz], C-order flatten.
    """
    z = np.linspace(0, 1, D, dtype=np.float32)
    y = np.linspace(0, 1, H, dtype=np.float32)
    x = np.linspace(0, 1, W, dtype=np.float32)
    gz, gy, gx = np.meshgrid(z, y, x, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


def round_up(n: int, m: int) -> int:
    """Smallest multiple of ``m`` >= ``n`` (shared lane/tile rounding helper)."""
    return -(-n // m) * m


def default_use_pallas(use_pallas):
    """Shared ``use_pallas=None`` resolution: Pallas kernels run on the TPU
    backend, the XLA fallback everywhere else. One helper so every gated op
    (idw/layers/decode) follows the same policy.

    Honors ``jax.default_device`` overrides: ``jax.default_backend()`` keeps
    reporting the process default platform inside a
    ``with jax.default_device(cpu)`` block, but code traced there LOWERS for
    the CPU device, where Pallas cannot lower — host-side init/prepare paths
    (bench.py's ``_cpu``, trainer init) rely on this."""
    if use_pallas is not None:
        return use_pallas
    dev = jax.config.jax_default_device
    if dev is not None:
        platform = dev if isinstance(dev, str) else getattr(
            dev, "platform", str(dev))
        return platform == "tpu"
    return jax.default_backend() == "tpu"


def idw_3d_knn(
    points_xyz: jax.Array,  # (P, 3) normalized coords; padded slots arbitrary
    values: jax.Array,      # (P,)
    valid: jax.Array,       # (P,) bool — False for padding slots
    out_shape: Tuple[int, int, int],
    k: int = 4,
    rho: float = 2.0,
    tau: float = 0.05,
    chunk: int = 16384,
) -> jax.Array:
    """IDW k-NN interpolation onto the dense (D, H, W) grid. Returns (D, H, W)."""
    D, H, W = out_shape
    gp = jnp.asarray(grid_points(D, H, W))
    Q = gp.shape[0]
    Qp = round_up(Q, chunk)
    if Qp != Q:
        gp = jnp.pad(gp, ((0, Qp - Q), (0, 0)))
    gp = gp.reshape(Qp // chunk, chunk, 3)

    pts = points_xyz.astype(jnp.float32)
    vals = values.astype(jnp.float32)
    inf = jnp.asarray(np.float32(np.inf))

    def one_chunk(g: jax.Array) -> jax.Array:  # g: (chunk, 3)
        # Exact difference formulation: the |g|^2+|p|^2-2g.p matmul expansion
        # catastrophically cancels for near neighbours (and the TPU MXU's
        # bf16 passes make it worse), flipping k-NN selection.
        diff = g[:, None, :] - pts[None, :, :]       # (chunk, P, 3)
        d2 = jnp.sum(diff * diff, axis=-1)
        d = jnp.sqrt(d2)
        d = jnp.where(valid[None, :], d, inf)
        # k-round iterative min extraction: k is tiny (4) so k argmin+select
        # passes over (chunk, P) beat a full top-k sort on the VPU.
        w_sum = jnp.zeros((g.shape[0],), jnp.float32)
        wv_sum = jnp.zeros((g.shape[0],), jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        for _ in range(k):
            idx = jnp.argmin(d, axis=1)               # lowest index on ties
            hit = col == idx[:, None]
            d_min = jnp.min(d, axis=1)
            v_min = jnp.sum(jnp.where(hit, vals[None, :], 0.0), axis=1)
            if abs(rho - 2.0) < 1e-6:
                invd = 1.0 / (d_min + tau)
                w = invd * invd
            else:
                w = 1.0 / jnp.power(d_min + tau, rho)
            w_sum = w_sum + w
            wv_sum = wv_sum + w * v_min
            d = jnp.where(hit, inf, d)
        return wv_sum / (w_sum + 1e-12)

    out = jax.lax.map(one_chunk, gp).reshape(-1)[:Q]
    return out.reshape(D, H, W)


def factored_prepare_full(
    mask_xy: jax.Array,  # (H, W) spatial observation pattern (>0 = observed)
    max_gauges: int,
    k: int = 4,
    use_pallas: bool | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Mask-derived stage of the factorized IDW.

    Split out so callers whose batch shares one mask (stis gauge files;
    sliding-window inference over one event) compute it ONCE and reuse it
    across samples.

    WARNING: the static-shape ``jnp.nonzero(size=max_gauges)`` SILENTLY
    truncates observed gauges beyond ``max_gauges`` (jit cannot raise on a
    traced count). Callers must bound the budget from the mask/config —
    ``P2IGenerator.from_config`` counts the stis gauge file exactly, and
    ``P2IGenerator.prepare_idw`` guards concrete masks host-side.
    Returns (gd2 (HW, k) top-k gauge distances^2 per pixel,
    gsel (HW, k) gauge-slot indices sorted ascending by gauge pixel,
    gauge_pix (G,) flat pixel index per gauge slot, HW-1 for padding slots).

    Known metric boundary (documented, not matched): this spatial gauge cut
    selects on squared distance, while the combine stage — like the torch
    reference's full cdist->topk — ranks candidates on the f32 SQRT of
    (gd2 + dz^2). If two gauges straddle a pixel's k-th boundary with gd2
    values 1 ULP apart, the cut keeps the strictly-closer one, but in the
    reference's sqrt-collapsed metric they are an exact tie and its
    first-index rule may pick the other. Matching would require carrying
    the tie margin through the cut (more than k gauges per pixel); the
    effect is bounded by the reference's own CPU-vs-CUDA tie noise
    (BASELINE.md tolerance table) and is orders below the shipped
    tolerances.
    """
    H, W = mask_xy.shape
    HW = H * W
    big = jnp.float32(1e30)

    flat = mask_xy.reshape(-1) > 0
    (gidx,) = jnp.nonzero(flat, size=max_gauges, fill_value=HW)
    safe = jnp.minimum(gidx, HW - 1)
    gvalid = gidx < HW
    gy = (safe // W).astype(jnp.float32) / max(H - 1, 1)
    gx = (safe % W).astype(jnp.float32) / max(W - 1, 1)

    # grid coords must match grid_points()' linspace bit-for-bit (the point
    # coords use idx/(N-1) like the reference's normalization — mixed, as in
    # layer.py:246-256 vs :334-341)
    qy = jnp.repeat(jnp.asarray(np.linspace(0, 1, H, dtype=np.float32)), W)
    qx = jnp.tile(jnp.asarray(np.linspace(0, 1, W, dtype=np.float32)), H)

    use_pallas = default_use_pallas(use_pallas)

    if use_pallas:
        from .pallas.idw_factored_kernel import gauge_topk_pallas

        penalty = jnp.where(gvalid, 0.0, big)
        gd2_t, gsel_t = gauge_topk_pallas(qx, qy, gx, gy, penalty, k=k)
        gd2 = jnp.transpose(gd2_t)           # (HW, k)
        gsel = jnp.transpose(gsel_t)
    else:
        dxy2 = (qx[:, None] - gx[None, :]) ** 2 + (qy[:, None] - gy[None, :]) ** 2
        dxy2 = jnp.where(gvalid[None, :], dxy2, big)  # (HW, G)

        # top-k gauges per pixel (iterative argmin, lowest index on ties)
        colg = jax.lax.broadcasted_iota(jnp.int32, dxy2.shape, 1)
        gd2_list, gsel_list = [], []
        dwork = dxy2
        for _ in range(k):
            idx = jnp.argmin(dwork, axis=1)
            gd2_list.append(jnp.min(dwork, axis=1))
            gsel_list.append(idx)
            dwork = jnp.where(colg == idx[:, None], big, dwork)
        gd2 = jnp.stack(gd2_list, axis=1)    # (HW, k)
        gsel = jnp.stack(gsel_list, axis=1)  # (HW, k) indices into gauge slots

    # reorder each pixel's selected gauges by ascending GAUGE PIXEL index
    # (top-k ranks them by distance; flat-order tie-breaking needs pixel
    # order; gauge slots themselves ascend in pixel order so sorting by slot
    # index == sorting by pixel). A fixed compare-swap network on the k
    # columns is ~50x faster on TPU than XLA's general sort for k=4.
    gp_cols = [gsel[:, i] for i in range(k)]
    gd_cols = [gd2[:, i] for i in range(k)]

    def swap(i, j):
        lt = gp_cols[i] <= gp_cols[j]
        gp_cols[i], gp_cols[j] = (jnp.where(lt, gp_cols[i], gp_cols[j]),
                                  jnp.where(lt, gp_cols[j], gp_cols[i]))
        gd_cols[i], gd_cols[j] = (jnp.where(lt, gd_cols[i], gd_cols[j]),
                                  jnp.where(lt, gd_cols[j], gd_cols[i]))

    if k == 4:
        for i, j in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
            swap(i, j)
    else:  # generic bubble network
        for end in range(k - 1, 0, -1):
            for i in range(end):
                swap(i, i + 1)
    gsel = jnp.stack(gp_cols, axis=1)
    gd2 = jnp.stack(gd_cols, axis=1)
    return gd2, gsel, safe


def factored_prepare(
    mask_xy: jax.Array,
    max_gauges: int,
    k: int = 4,
    use_pallas: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Back-compat wrapper: (gd2 (HW, k), gpix (HW, k) flat PIXEL indices)."""
    gd2, gsel, gauge_pix = factored_prepare_full(mask_xy, max_gauges, k=k,
                                                 use_pallas=use_pallas)
    return gd2, gauge_pix[gsel]


@functools.lru_cache(maxsize=8)
def frame_dz2_np(D: int) -> np.ndarray:
    """(D query z, D frames) squared z-distances, exactly as the grid/point
    normalizations produce them (grid linspace vs point idx/(D-1))."""
    zq = np.linspace(0, 1, D, dtype=np.float32)
    zp = (np.arange(D, dtype=np.float32) / max(D - 1, 1)).astype(np.float32)
    return (zq[:, None] - zp[None, :]) ** 2


def factored_apply_gauges(
    gd2: jax.Array,          # (HW, k) from factored_prepare_full
    gsel: jax.Array,         # (HW, k) gauge-slot indices
    gauge_vals: jax.Array,   # (D, G) values AT the gauge slots
    out_hw: Tuple[int, int],
    k: int = 4,
    rho: float = 2.0,
    tau: float = 0.05,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Value-dependent stage of the factorized IDW from the (D, G) gauge
    table — candidates gather from the tiny table instead of the full field
    (values at non-observed pixels never contribute; reference
    layer.py:340-344 gathers values at nonzero points only)."""
    H, W = out_hw
    D = gauge_vals.shape[0]
    HW = H * W
    use_pallas = default_use_pallas(use_pallas)

    # all frames stay candidates IN THE XLA PATH (the Pallas kernel prunes
    # frames per query z with an exact, tie-aware static selection); only
    # the spatial gauge cut prunes here — any global top-k pair's gauge must
    # be in its pixel's top-k gauges (same-frame domination argument)
    dz2 = jnp.asarray(frame_dz2_np(D))  # (D query z, D frames)

    if use_pallas:
        # candidate values gather IN-KERNEL from the (D, G) table via one-hot
        # matmuls — no (HW, D*k) tensor ever touches HBM
        from .pallas.idw_factored_kernel import combine_table_with_vjp

        out = combine_table_with_vjp(jnp.transpose(gd2), jnp.transpose(gsel),
                                     gauge_vals, dz2, k, D, rho, tau)
        return out.reshape(D, H, W)

    # FRAME-MAJOR candidate layout (HW, D, k): candidate index = f*k + slot is
    # lexicographic in (frame, pixel) because gauge slots ascend in pixel
    # order — so argmin's lowest-index tie-break IS the reference's flat
    # (t-major) nonzero order; no explicit tie handling needed.
    cvals = jnp.transpose(gauge_vals[:, gsel], (1, 0, 2)).reshape(HW, D * k)
    return _factored_combine_xla(gd2, cvals, dz2, k, rho, tau).reshape(D, H, W)


def factored_apply_gauges_batch(
    gd2: jax.Array,           # (HW, k) from factored_prepare_full
    gsel: jax.Array,          # (HW, k) gauge-slot indices
    gauge_vals: jax.Array,    # (N, D, G) per-window values AT the gauge slots
    out_hw: Tuple[int, int],
    k: int = 4,
    rho: float = 2.0,
    tau: float = 0.05,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Batched ``factored_apply_gauges`` for N windows sharing ONE mask
    (stis gauge training batches; sliding windows of one event): the
    candidate selection is computed once per pixel block and applied to
    every window (the vmapped single-window kernel redid it N times —
    the dominant cost of the combine, PROFILE.md). Returns (N, D, H, W)."""
    H, W = out_hw
    N, D, _ = gauge_vals.shape
    use_pallas = default_use_pallas(use_pallas)
    if use_pallas:
        from .pallas.idw_factored_kernel import combine_table_multi_with_vjp

        # the kernel's VMEM working set scales with N*hw_block (all windows'
        # candidate rows live in VMEM); shrink the pixel block for large
        # batches to stay inside Mosaic's 16 MB scoped-VMEM stack, and
        # above 64 windows (the lane dim cannot shrink below 128) chunk the
        # window axis into separate kernel calls
        dz2 = jnp.asarray(frame_dz2_np(D))
        gd2_t, gsel_t = jnp.transpose(gd2), jnp.transpose(gsel)
        parts = []
        for lo in range(0, N, 64):
            chunk = gauge_vals[lo:lo + 64]
            n = chunk.shape[0]
            hw_block = 512 if n <= 16 else (256 if n <= 32 else 128)
            parts.append(combine_table_multi_with_vjp(
                gd2_t, gsel_t, chunk, dz2, k, D, rho, tau, hw_block))
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return out.reshape(N, D, H, W)
    return jax.vmap(lambda t: factored_apply_gauges(
        gd2, gsel, t, out_hw, k=k, rho=rho, tau=tau,
        use_pallas=False))(gauge_vals)


def factored_apply(
    gd2: jax.Array,         # (HW, k) from factored_prepare
    gpix: jax.Array,        # (HW, k) flat pixel indices
    values_dhw: jax.Array,  # (D, H, W)
    k: int = 4,
    rho: float = 2.0,
    tau: float = 0.05,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Value-dependent stage of the factorized IDW, gathering candidates
    directly from the dense field (see factored_apply_gauges for the
    gauge-table fast path)."""
    D, H, W = values_dhw.shape
    HW = H * W
    use_pallas = default_use_pallas(use_pallas)

    dz2 = jnp.asarray(frame_dz2_np(D))

    vals2d = values_dhw.reshape(D, HW)
    cvals = jnp.transpose(vals2d[:, gpix], (1, 0, 2)).reshape(HW, D * k)

    if use_pallas:
        from .pallas.idw_factored_kernel import combine_with_vjp

        out = combine_with_vjp(jnp.transpose(gd2), jnp.transpose(cvals), dz2,
                               k, D, rho, tau)
        return out.reshape(D, H, W)

    return _factored_combine_xla(gd2, cvals, dz2, k, rho, tau).reshape(D, H, W)


def idw_3d_factored(
    mask_xy: jax.Array,     # (H, W) spatial observation pattern (>0 = observed)
    values_dhw: jax.Array,  # (D, H, W) values at observed locations
    max_gauges: int,
    k: int = 4,
    rho: float = 2.0,
    tau: float = 0.05,
    use_pallas: bool | None = None,  # None = auto: the fused Mosaic kernels on
    # TPU (they also compile far faster there than the XLA scan formulation)
) -> jax.Array:
    """Exact IDW k-NN for masks constant across frames (sti / stis types).

    The observation set factorizes as {G gauge pixels} x {D frames}, so any
    point in the global top-k must pair a top-k spatial gauge (per pixel)
    with some frame: a (g, f) pair beaten by >= k same-f pairs at nearer
    gauges cannot be a global top-k member. Work drops from Q x (G*D)
    distances to Q x (k*D) candidates. Ties break by flat (t-major) point
    index, matching the reference's nonzero ordering (layer.py:329-344).
    """
    gd2, gpix = factored_prepare(mask_xy, max_gauges, k=k, use_pallas=use_pallas)
    return factored_apply(gd2, gpix, values_dhw, k=k, rho=rho, tau=tau,
                          use_pallas=use_pallas)


def _factored_combine_xla(gd2: jax.Array,    # (HW, k)
                          cvals: jax.Array,  # (HW, D*k)
                          dz2: jax.Array,    # (D, D)
                          k: int, rho: float, tau: float) -> jax.Array:
    """XLA candidate-combine (also the VJP reference for the Pallas kernel)."""
    HW = gd2.shape[0]
    D = dz2.shape[0]
    bigd = jnp.sqrt(jnp.float32(1e30))

    def one_z(fd2_row: jax.Array) -> jax.Array:  # (D frames,)
        cd = jnp.sqrt(gd2[:, None, :] + fd2_row[None, :, None])  # (HW, D, k)
        cd = jnp.where(cd < bigd, cd, bigd).reshape(HW, D * k)
        col = jax.lax.broadcasted_iota(jnp.int32, cd.shape, 1)
        w_sum = jnp.zeros((HW,), jnp.float32)
        wv_sum = jnp.zeros((HW,), jnp.float32)
        for _ in range(k):
            d_min = jnp.min(cd, axis=-1)
            idx = jnp.argmin(cd, axis=-1)
            hit = col == idx[:, None]
            v = jnp.sum(jnp.where(hit, cvals, 0.0), axis=-1)
            if abs(rho - 2.0) < 1e-6:
                invd = 1.0 / (d_min + tau)
                w = invd * invd
            else:
                w = 1.0 / jnp.power(d_min + tau, rho)
            w = jnp.where(d_min < bigd, w, 0.0)
            w_sum = w_sum + w
            wv_sum = wv_sum + w * v
            cd = jnp.where(hit, bigd, cd)
        return wv_sum / (w_sum + 1e-12)

    return jax.lax.map(one_z, dz2)  # (D, HW)


def extract_points(
    mask_dhw: jax.Array,    # (D, H, W) observation mask (>0 = observed)
    values_dhw: jax.Array,  # (D, H, W) values at observed locations
    max_points: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Static-shape replacement for the reference's nonzero() gather.

    Returns (points (max_points, 3) in (x, y, z) normalized coords,
    values (max_points,), valid (max_points,) bool). Points beyond
    ``max_points`` are dropped (callers size it from the mask type).
    """
    D, H, W = mask_dhw.shape
    Qt = D * H * W
    flat = mask_dhw.reshape(-1) > 0
    (idx,) = jnp.nonzero(flat, size=max_points, fill_value=Qt)
    valid = idx < Qt
    safe = jnp.minimum(idx, Qt - 1)
    tz = safe // (H * W)
    rem = safe % (H * W)
    ty = rem // W
    tx = rem % W
    points = jnp.stack(
        [
            tx.astype(jnp.float32) / max(W - 1, 1),
            ty.astype(jnp.float32) / max(H - 1, 1),
            tz.astype(jnp.float32) / max(D - 1, 1),
        ],
        axis=-1,
    )
    vals = values_dhw.reshape(-1)[safe] * valid.astype(values_dhw.dtype)
    return points, vals, valid
