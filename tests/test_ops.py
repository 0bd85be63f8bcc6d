"""Golden-value tests: ops layer vs torch CPU semantics."""


import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from p2igan_tpu.ops import convs as C
from p2igan_tpu.ops import doconv as DO
from p2igan_tpu.ops import idw as IDW
from p2igan_tpu.ops import wendland as WL
from p2igan_tpu.ops.layers import downsample_duplicate_channels
from p2igan_tpu.ops.spectral_norm import SNConv


def nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


@pytest.mark.parametrize("groups,stride,pad", [(1, 1, 1), (4, 1, 1), (1, 2, 1), (2, 2, 0)])
def test_conv2d_matches_torch(rng, groups, stride, pad):
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    w_oihw = rng.normal(size=(12, 8 // groups, 3, 3)).astype(np.float32)
    b = rng.normal(size=(12,)).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(nchw(x)), torch.from_numpy(w_oihw),
                   torch.from_numpy(b), stride=stride, padding=pad, groups=groups).numpy()
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    out = C.conv2d(jnp.asarray(x), jnp.asarray(w_hwio), stride=stride,
                   padding=pad, groups=groups, bias=jnp.asarray(b))
    np.testing.assert_allclose(nhwc(ref), np.asarray(out), atol=1e-4)


def test_conv3d_matches_torch(rng):
    x = rng.normal(size=(2, 6, 8, 8, 3)).astype(np.float32)  # B,T,H,W,C
    w = rng.normal(size=(5, 3, 3, 3, 3)).astype(np.float32)  # O,I,kt,kh,kw
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    ref = F.conv3d(xt, torch.from_numpy(w), stride=(1, 2, 2), padding=(1, 1, 1)).numpy()
    w_dhwio = np.transpose(w, (2, 3, 4, 1, 0))
    out = C.conv3d(jnp.asarray(x), jnp.asarray(w_dhwio), stride=(1, 2, 2), padding=(1, 1, 1))
    np.testing.assert_allclose(np.transpose(ref, (0, 2, 3, 4, 1)), np.asarray(out), atol=1e-4)


def test_conv3d_temporal_decomposition_matches_native(rng):
    """The opt-in temporal-tap decomposition (measured slower on the GAN
    step, kept for shapes where the slices fuse — convs.py) must stay
    numerically equal to the native 5D conv across stride/pad patterns."""
    for (shape, cout, ks, st, pd) in [
        ((2, 6, 8, 8, 3), 5, (3, 3, 3), (1, 2, 2), (1, 1, 1)),
        ((2, 8, 6, 6, 4), 6, (3, 3, 3), (2, 1, 1), (1, 1, 1)),
        ((1, 4, 8, 8, 3), 5, (2, 3, 3), (2, 2, 2), (0, 1, 1)),
    ]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        k = jnp.asarray(rng.normal(size=ks + (shape[-1], cout)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        a = C.conv3d(x, k, stride=st, padding=pd, bias=b, decompose_t=False)
        d = C.conv3d(x, k, stride=st, padding=pd, bias=b, decompose_t=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(d), atol=1e-4)


def test_doconv_fuse_repeat_skip_groups1(rng):
    """fuse_repeat_skip must also work at groups=1 (regression: a gate
    refactor briefly required groups>1, silently dropping the skip)."""
    import jax

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    plain = DO.DOConv2d(4, 16, 3, padding=1, groups=1, factored=False)
    fused = DO.DOConv2d(4, 16, 3, padding=1, groups=1, factored=False,
                        fuse_repeat_skip=True)
    v = plain.init(jax.random.key(0), x)
    want = plain.apply(v, x) + jnp.repeat(x, 4, axis=-1)
    got = fused.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_doconv_dense_groups_gradient_parity(rng):
    """dense_groups must not change W/D gradients: the VJP of the block
    .set()s extracts exactly the on-block slices (the autodiff-safety
    claim behind using the expansion in training, doconv.py)."""
    import jax

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    grouped = DO.DOConv2d(8, 16, 3, padding=1, groups=4, factored=True)
    dense = DO.DOConv2d(8, 16, 3, padding=1, groups=4, factored=True,
                        dense_groups=True)
    v = grouped.init(jax.random.key(0), x)

    def loss(params, mod):
        return jnp.sum(mod.apply({"params": params}, x) * g)

    g_a = jax.grad(lambda p: loss(p, grouped))(v["params"])
    g_b = jax.grad(lambda p: loss(p, dense))(v["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-5),
        g_a, g_b)


def test_conv_transpose3d_matches_torch(rng):
    x = rng.normal(size=(1, 4, 6, 6, 8)).astype(np.float32)
    w = rng.normal(size=(8, 5, 2, 2, 2)).astype(np.float32)  # I,O,kt,kh,kw (torch layout)
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    ref = F.conv_transpose3d(xt, torch.from_numpy(w), stride=2).numpy()
    w_dhwio = np.transpose(w, (2, 3, 4, 1, 0))  # (k..., Cout, Cin)
    out = C.conv_transpose3d(jnp.asarray(x), jnp.asarray(w_dhwio), stride=2, padding=0)
    np.testing.assert_allclose(np.transpose(ref, (0, 2, 3, 4, 1)), np.asarray(out), atol=1e-4)


def test_pools_match_torch(rng):
    x = rng.normal(size=(2, 17, 19, 4)).astype(np.float32)
    xt = torch.from_numpy(nchw(x))
    ref = F.max_pool2d(xt, 2, 2).numpy()
    out = C.max_pool2d(jnp.asarray(x), 2, 2)
    np.testing.assert_allclose(nhwc(ref), np.asarray(out), atol=1e-6)
    # avg_pool2d with padding, count_include_pad=True (torch default)
    ref = F.avg_pool2d(xt, kernel_size=4, stride=1, padding=2).numpy()
    out = C.avg_pool2d(jnp.asarray(x), 4, 1, padding=2)
    np.testing.assert_allclose(nhwc(ref), np.asarray(out), atol=1e-5)
    # spatial_pool pattern (losses.py:88-91): k5 s4 p2
    ref = F.max_pool2d(xt, kernel_size=5, stride=4, padding=2).numpy()
    out = C.max_pool2d(jnp.asarray(x), 5, 4, padding=2)
    np.testing.assert_allclose(nhwc(ref), np.asarray(out), atol=1e-6)


def test_bilinear_upsample_align_corners(rng):
    x = rng.normal(size=(2, 7, 9, 3)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(nchw(x)), scale_factor=2, mode="bilinear",
                        align_corners=True).numpy()
    out = C.bilinear_upsample2x_align_corners(jnp.asarray(x))
    np.testing.assert_allclose(nhwc(ref), np.asarray(out), atol=1e-5)


def test_bilinear_resize_align_false(rng):
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(nchw(x)), size=(13, 5), mode="bilinear",
                        align_corners=False).numpy()
    out = C.bilinear_resize_align_false(jnp.asarray(x), (13, 5))
    np.testing.assert_allclose(nhwc(ref), np.asarray(out), atol=1e-5)


@pytest.mark.parametrize("groups", [1, 4])
def test_doconv_compose_matches_torch_einsum(rng, groups):
    out_ch, in_ch, M = 8, 8, 3
    D_mul = M * M
    W = rng.normal(size=(out_ch, in_ch // groups, D_mul)).astype(np.float32)
    D = rng.normal(size=(in_ch, M * M, D_mul)).astype(np.float32) * 0.1
    D_diag = DO.make_d_diag(in_ch, M, M, D_mul)
    # torch formula (deconv_pytorch.py:117-124)
    Dm = torch.from_numpy(D + D_diag)
    Wr = torch.from_numpy(W).reshape(out_ch // groups, in_ch, D_mul)
    dow_ref = torch.einsum("ims,ois->oim", Dm, Wr).reshape(out_ch, in_ch // groups, M, M)

    hwio = DO.compose_doconv_kernel(jnp.asarray(W), jnp.asarray(D), jnp.asarray(D_diag),
                                    out_ch, in_ch, groups, M, M)
    np.testing.assert_allclose(
        dow_ref.numpy(), np.transpose(np.asarray(hwio), (3, 2, 0, 1)), atol=1e-5)

    # fold + conv equivalence end-to-end
    x = rng.normal(size=(2, 10, 10, in_ch)).astype(np.float32)
    folded = DO.fold_doconv(W, D, D_diag)
    ref = F.conv2d(torch.from_numpy(nchw(x)), torch.from_numpy(folded),
                   padding=1, groups=groups).numpy()
    out = C.conv2d(jnp.asarray(x), hwio, stride=1, padding=1, groups=groups)
    np.testing.assert_allclose(nhwc(ref), np.asarray(out), atol=1e-4)


def test_spectral_norm_matches_torch(rng):
    cin, cout = 6, 10
    conv = torch.nn.Conv2d(cin, cout, 3, stride=2, padding=1)
    snconv = torch.nn.utils.spectral_norm(conv)
    x = rng.normal(size=(2, 12, 12, cin)).astype(np.float32)
    xt = torch.from_numpy(nchw(x))

    w_orig = snconv.weight_orig.detach().numpy().copy()
    u0 = snconv.weight_u.detach().numpy().copy()  # buffer is updated in place
    v0 = snconv.weight_v.detach().numpy().copy()
    bias = snconv.bias.detach().numpy().copy()

    # two training forwards (two power iterations), then an eval forward
    snconv.train()
    with torch.no_grad():
        snconv(xt)
        snconv(xt)
    snconv.eval()
    with torch.no_grad():
        ref = snconv(xt).numpy()
    u_torch = snconv.weight_u.detach().numpy()

    mod = SNConv(cin, cout, kernel_size=(3, 3), stride=(2, 2), padding=(1, 1))
    params = {
        "params": {"kernel": jnp.asarray(np.transpose(w_orig, (2, 3, 1, 0))),
                   "bias": jnp.asarray(bias)},
        "spectral": {"u": jnp.asarray(u0), "v": jnp.asarray(v0)},
    }
    out, upd = mod.apply(params, jnp.asarray(x), update_stats=True, mutable=["spectral"])
    vars2 = {**params, "spectral": upd["spectral"]}
    out, upd = mod.apply(vars2, jnp.asarray(x), update_stats=True, mutable=["spectral"])
    np.testing.assert_allclose(u_torch, np.asarray(upd["spectral"]["u"]), atol=1e-4)
    vars3 = {**params, "spectral": upd["spectral"]}
    out = mod.apply(vars3, jnp.asarray(x), update_stats=False)
    np.testing.assert_allclose(nhwc(ref), np.asarray(out), atol=1e-4)


def test_downsample_duplicate_channels(rng):
    T = 4
    x = rng.normal(size=(2, 8, 8, 3 * T)).astype(np.float32)
    # torch reference logic (layer.py:205-214)
    xt = torch.from_numpy(nchw(x))
    b, c, h, w = xt.shape
    y = F.max_pool2d(xt, 2, 2).contiguous()
    y = y.view(b * T, c // T, h // 2, w // 2).repeat_interleave(2, dim=1)
    ref = y.reshape(b, T * (c // T) * 2, h // 2, w // 2).numpy()
    out = downsample_duplicate_channels(jnp.asarray(x), T)
    np.testing.assert_allclose(nhwc(ref), np.asarray(out), atol=1e-6)


def test_idw_matches_naive(rng):
    """Blocked static-shape IDW vs dense numpy replica of the reference math."""
    D, H, W = 4, 12, 12
    k, rho, tau = 4, 2.0, 0.05
    n_pts = 23
    gp = IDW.grid_points(D, H, W)
    pts = rng.random((n_pts, 3)).astype(np.float32)
    vals = rng.normal(size=(n_pts,)).astype(np.float32)

    # naive: cdist -> topk -> inverse-distance weights (layer.py:259-293)
    d = np.sqrt(((gp[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    idx = np.argsort(d, axis=1)[:, :k]
    d_k = np.take_along_axis(d, idx, axis=1)
    w = 1.0 / (d_k + tau) ** rho
    w = w / (w.sum(1, keepdims=True) + 1e-12)
    ref = (vals[idx] * w).sum(1).reshape(D, H, W)

    # padded static shape with invalid slots
    P = 32
    pts_p = np.zeros((P, 3), np.float32)
    vals_p = np.zeros((P,), np.float32)
    pts_p[:n_pts] = pts
    vals_p[:n_pts] = vals
    valid = np.arange(P) < n_pts
    out = IDW.idw_3d_knn(jnp.asarray(pts_p), jnp.asarray(vals_p), jnp.asarray(valid),
                         (D, H, W), k=k, rho=rho, tau=tau, chunk=64)
    np.testing.assert_allclose(ref, np.asarray(out), atol=2e-3, rtol=1e-3)


def test_idw_empty_mask_gives_zeros():
    P = 8
    out = IDW.idw_3d_knn(jnp.zeros((P, 3)), jnp.zeros((P,)), jnp.zeros((P,), bool),
                         (2, 4, 4), k=4, chunk=16)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_extract_points(rng):
    D, H, W = 3, 6, 5
    mask = (rng.random((D, H, W)) < 0.2).astype(np.float32)
    values = rng.normal(size=(D, H, W)).astype(np.float32)
    pts, vals, valid = IDW.extract_points(jnp.asarray(mask), jnp.asarray(values), 32)
    n = int(mask.sum())
    assert int(np.asarray(valid).sum()) == n
    tz, ty, tx = np.nonzero(mask)
    exp = np.stack([tx / (W - 1), ty / (H - 1), tz / (D - 1)], -1).astype(np.float32)
    np.testing.assert_allclose(np.asarray(pts)[:n], exp, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vals)[:n], values[tz, ty, tx], atol=1e-6)


def test_wendland_matches_torch_reference(rng):
    """Wendland basis values vs a direct torch replica of dk.py:27-36."""
    d = np.abs(rng.normal(size=(100,))).astype(np.float64)
    dt = torch.from_numpy(d)
    ref = torch.zeros_like(dt)
    m = dt <= 1.0
    dm = dt[m]
    ref[m] = ((1 - dm) ** 6) * (35 * dm ** 2 + 18 * dm + 3) / 3
    np.testing.assert_allclose(ref.numpy(), WL.wendland_c2(d), atol=1e-12)


def test_phi_space_shapes_and_support():
    phi = WL.build_phi_space(128, 128)
    assert phi.shape == (128 * 128, 10 + 19 + 37 + 73)
    assert phi.min() >= 0.0 and phi.max() <= 1.0001
    # a knot location evaluates to wendland(0) = 1 at its own pixel
    knots, theta = WL.build_space_knots(128, 128)
    y, x = knots[0].astype(int)
    assert abs(phi[y * 128 + x, 0] - 1.0) < 1e-6


def test_phi_time_count():
    K_t = WL.time_basis_count(16)
    phi = WL.build_phi_time(16)
    assert phi.shape == (16, K_t)
