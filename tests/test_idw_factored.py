"""Factorized IDW (frame-constant masks) vs the generic k-NN implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from p2igan_tpu.ops import idw as IDW


def _generic(mask_xy, values, k=4, tau=0.05):
    """Deterministic numpy reference on the expanded point set: stable argsort
    (flat t-major tie-break), float32 distances computed as (dx2+dy2)+dz2.

    Note: the jitted XLA generic path can flip ULP-level systematic z-ties
    (XLA fusion rounds the distance sum differently than eager), so the
    spec-true numpy ordering is the comparison target here.
    """
    D, H, W = values.shape
    mask_dhw = np.broadcast_to(mask_xy[None], (D, H, W)).astype(np.float32)
    pts_j, vals_j, valid_j = IDW.extract_points(jnp.asarray(mask_dhw),
                                                jnp.asarray(values), D * H * W // 2)
    pts = np.asarray(pts_j)
    vals = np.asarray(vals_j)
    valid = np.asarray(valid_j)
    gp = IDW.grid_points(D, H, W)
    diff = (gp[:, None, :] - pts[None, :, :]).astype(np.float32)
    sq = diff * diff
    d = np.sqrt((sq[..., 0] + sq[..., 1]) + sq[..., 2], dtype=np.float32)
    d[:, ~valid] = np.inf
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    d_k = np.take_along_axis(d, idx, axis=1)
    w = (1.0 / (d_k + tau) ** 2).astype(np.float32)
    w = w / (w.sum(1, keepdims=True) + 1e-12)
    w[~np.isfinite(d_k)] = 0.0
    out = (np.nan_to_num(vals[idx]) * w).sum(1)
    return out.reshape(D, H, W)


@pytest.mark.parametrize("n_gauges", [1, 7, 33])
def test_factored_matches_generic(rng, n_gauges):
    D, H, W = 5, 12, 12
    mask_xy = np.zeros((H * W,), np.float32)
    mask_xy[rng.choice(H * W, n_gauges, replace=False)] = 1.0
    mask_xy = mask_xy.reshape(H, W)
    values = rng.normal(size=(D, H, W)).astype(np.float32)
    ref = _generic(mask_xy, values)
    out = np.asarray(IDW.idw_3d_factored(jnp.asarray(mask_xy), jnp.asarray(values),
                                         max_gauges=64))
    np.testing.assert_allclose(ref, out, atol=1e-4, rtol=1e-4)


def test_factored_exact_tie_at_gauge(rng):
    """Grid point exactly on a gauge: systematic +-z distance ties must break
    identically (lower frame index first, matching flat nonzero order)."""
    D, H, W = 6, 8, 8
    mask_xy = np.zeros((H, W), np.float32)
    mask_xy[3, 4] = 1.0
    mask_xy[1, 2] = 1.0
    values = rng.normal(size=(D, H, W)).astype(np.float32)
    ref = _generic(mask_xy, values)
    out = np.asarray(IDW.idw_3d_factored(jnp.asarray(mask_xy), jnp.asarray(values),
                                         max_gauges=128))
    np.testing.assert_allclose(ref, out, atol=1e-4, rtol=1e-4)


def test_factored_empty_mask(rng):
    D, H, W = 3, 8, 8
    out = np.asarray(IDW.idw_3d_factored(jnp.zeros((H, W)),
                                         jnp.asarray(rng.normal(size=(D, H, W))
                                                     .astype(np.float32)),
                                         max_gauges=128))
    np.testing.assert_array_equal(out, 0.0)


def test_factored_single_frame():
    D, H, W = 1, 6, 6
    mask_xy = np.zeros((H, W), np.float32)
    mask_xy[2, 2] = 1.0
    values = np.full((D, H, W), 3.0, np.float32)
    out = np.asarray(IDW.idw_3d_factored(jnp.asarray(mask_xy), jnp.asarray(values),
                                         max_gauges=128))
    np.testing.assert_allclose(out, 3.0, atol=1e-5)


def test_shared_batch_mask_inputblock_equivalence(rng):
    """InputBlock shared-mask fast path == per-sample factored path."""
    import jax
    from p2igan_tpu.ops.layers import InputBlock

    B, H, W, D = 3, 16, 16, 4
    mask_xy = np.zeros((H * W,), np.float32)
    mask_xy[rng.choice(H * W, 10, replace=False)] = 1.0
    masks = np.broadcast_to(mask_xy.reshape(1, H, W, 1), (B, H, W, D)).copy()
    x = rng.random((B, H, W, D)).astype(np.float32) * masks

    a = InputBlock(factored=True, shared_batch_mask=False, max_points=D * 128)
    b = InputBlock(factored=True, shared_batch_mask=True, max_points=D * 128)
    va = a.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(masks))
    out_a = a.apply(va, jnp.asarray(x), jnp.asarray(masks))
    out_b = b.apply(va, jnp.asarray(x), jnp.asarray(masks))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


@pytest.mark.slow
def test_prepared_idw_hoist_equivalence():
    """P2IGenerator with hoisted gauge selection == inline selection, and the
    reconstructor's compiled program (which hoists internally) matches the
    unhoisted output."""
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.inference.driver import SlidingWindowReconstructor
    from p2igan_tpu.models import P2IGenerator

    rng = np.random.default_rng(5)
    hw, t = 16, 4
    gen = P2IGenerator(H=hw, W=hw, length=t, num_res=1, base_channels=16,
                       idw_max_points=128, idw_chunk=256,
                       idw_factored=True, idw_shared_batch_mask=True)
    flat = np.zeros((hw * hw,), np.float32)
    flat[rng.choice(hw * hw, 13, replace=False)] = 1.0
    masks = np.broadcast_to(flat.reshape(1, 1, hw, hw, 1),
                            (2, t, hw, hw, 1)).astype(np.float32)
    frames = rng.random((2, t, hw, hw, 1)).astype(np.float32)
    masked = frames * masks
    variables = gen.init(jax.random.key(0), jnp.asarray(masked), jnp.asarray(masks))

    inline = gen.apply(variables, jnp.asarray(masked), jnp.asarray(masks))
    prep = gen.prepare_idw(jnp.asarray(masks[0, 0, :, :, 0]))
    hoisted = gen.apply(variables, jnp.asarray(masked), jnp.asarray(masks),
                        idw_prepared=prep)
    np.testing.assert_array_equal(np.asarray(inline), np.asarray(hoisted))

    # event-level: reconstructor hoists internally
    ev_masked, ev_masks = masked[0], masks[0]
    recon = SlidingWindowReconstructor(gen, variables, stride=t, overlap=1,
                                       window_batch=2, t_bucket=t)
    out = recon(ev_masked, ev_masks)
    gen_inline = P2IGenerator(H=hw, W=hw, length=t, num_res=1, base_channels=16,
                              idw_max_points=128, idw_chunk=256,
                              idw_factored=True, idw_shared_batch_mask=False)
    recon2 = SlidingWindowReconstructor(gen_inline, variables, stride=t,
                                        overlap=1, window_batch=2, t_bucket=t)
    out2 = recon2(ev_masked, ev_masks)
    np.testing.assert_allclose(out, out2, atol=1e-5)
