"""Golden tests: loss library vs torch replicas of the reference formulas."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from p2igan_tpu import losses as L


def _pair(rng, shape=(2, 5, 8, 8)):
    pred = rng.random(shape).astype(np.float32)
    true = rng.random(shape).astype(np.float32)
    return pred, true


def test_weighted_l1(rng):
    pred, true = _pair(rng)
    a, b, c, x_max = 0.50, 5.14, 0.12, 0.70
    tp, tt = torch.from_numpy(pred), torch.from_numpy(true)
    w_max = a * torch.exp(torch.tensor(b * x_max)) + c
    w = a * torch.exp(b * tt) + c
    weight = torch.where(tt > x_max, w_max, w)
    ref = torch.mean(weight * torch.abs(tp - tt)).item()
    out = float(L.weighted_l1_distance(jnp.asarray(pred), jnp.asarray(true)))
    assert abs(ref - out) < 1e-6


def test_softmax_temperature_and_kl(rng):
    pred, true = _pair(rng)
    pd = pred[:, 1:] - pred[:, :-1]
    td = true[:, 1:] - true[:, :-1]

    def torch_softmax_t(x, temp):
        s = x.shape
        return F.softmax(torch.from_numpy(x).view(s[0], s[1], -1) / temp, dim=-1).view(s)

    p_ref = torch_softmax_t(pd, 0.1)
    q_ref = torch_softmax_t(td, 0.1)
    kl_ref = F.kl_div(
        p_ref.view(p_ref.size(0), p_ref.size(1), -1).log(),
        q_ref.view(q_ref.size(0), q_ref.size(1), -1),
        reduction="batchmean",
    ).item()

    p = L.softmax_temperature(jnp.asarray(pd), 0.1)
    q = L.softmax_temperature(jnp.asarray(td), 0.1)
    np.testing.assert_allclose(p_ref.numpy(), np.asarray(p), atol=1e-6)
    kl = float(L.kl_divergence(p, q))
    assert abs(kl_ref - kl) < 1e-4


def test_reconstruction_loss(rng):
    pred, true = _pair(rng)
    loss, parts = L.reconstruction_loss(jnp.asarray(pred), jnp.asarray(true), k1_alpha=0.05)
    assert abs(float(loss) - (float(parts["pool"]) + 0.05 * float(parts["reg"]))) < 1e-6


def test_shock_map_matches_torch(rng):
    pred, true = _pair(rng, (2, 3, 16, 16))

    def torch_shock(x, beta=30.0, eps=1e-12):
        b, f, h, w = x.shape
        x4 = torch.from_numpy(x).reshape(b * f, 1, h, w)
        kx = torch.tensor([[1, 0, -1], [2, 0, -2], [1, 0, -1]], dtype=torch.float32
                          ).view(1, 1, 3, 3) / 8
        ky = kx.transpose(-1, -2).contiguous()
        kl = torch.tensor([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=torch.float32
                          ).view(1, 1, 3, 3)
        pad = lambda t: F.pad(t, (1, 1, 1, 1), mode="reflect")  # noqa: E731
        gx = F.conv2d(pad(x4), kx)
        gy = F.conv2d(pad(x4), ky)
        grad = torch.sqrt(gx * gx + gy * gy + eps)
        lap = F.conv2d(pad(x4), kl)
        return (torch.tanh(beta * lap) * grad).reshape(b, f, h, w)

    ref = torch_shock(pred).numpy()
    out = np.asarray(L.shock_map(jnp.asarray(pred)))
    np.testing.assert_allclose(ref, out, atol=1e-5)

    # shock_map_loss with pooling + border crop
    sp = torch_shock(pred, 0.02)
    st = torch_shock(true, 0.02)
    diff = F.relu(torch.abs(st) - torch.abs(sp))[..., 2:-2, 2:-2].mean().item()
    ours = float(L.shock_map_loss(jnp.asarray(pred), jnp.asarray(true),
                                  beta=0.02, border_ignore=2, pool=1).mean())
    assert abs(diff - ours) < 1e-6


def test_temporal_difference_matching(rng):
    pred, true = _pair(rng, (2, 5, 16, 16))
    pd, td = pred[:, 1:] - pred[:, :-1], true[:, 1:] - true[:, :-1]
    pool = torch.nn.MaxPool2d(kernel_size=5, stride=4, padding=2)
    pp = pool(torch.from_numpy(pd))
    tp = pool(torch.from_numpy(td))
    base = pool(torch.from_numpy(true[:, :-1]))
    wgt = 1.0 / (1.0 + base + 1e-6)
    ref = (((pp - tp) ** 2) * wgt).mean().item()
    out = float(L.temporal_difference_matching_loss(
        jnp.asarray(pd), jnp.asarray(td), jnp.asarray(true)))
    assert abs(ref - out) < 1e-6


def test_gan_losses(rng):
    logits = rng.normal(size=(4, 10)).astype(np.float32)
    lt = torch.from_numpy(logits)
    # hinge
    assert abs(float(L.gan_loss(jnp.asarray(logits), True, loss_type="hinge", is_disc=True))
               - F.relu(1 - lt).mean().item()) < 1e-6
    assert abs(float(L.gan_loss(jnp.asarray(logits), False, loss_type="hinge", is_disc=True))
               - F.relu(1 + lt).mean().item()) < 1e-6
    assert abs(float(L.gan_loss(jnp.asarray(logits), True, loss_type="hinge", is_disc=False))
               - (-lt).mean().item()) < 1e-6
    # lsgan
    assert abs(float(L.gan_loss(jnp.asarray(logits), True, loss_type="lsgan"))
               - F.mse_loss(lt, torch.ones_like(lt)).item()) < 1e-6
    # nsgan on probabilities
    probs = rng.random((4, 10)).astype(np.float32)
    pt = torch.from_numpy(probs)
    ref = torch.nn.BCELoss()(pt, torch.ones_like(pt)).item()
    assert abs(float(L.gan_loss(jnp.asarray(probs), True, loss_type="nsgan")) - ref) < 1e-5


def test_k1_loss_combination(rng):
    pred, true = _pair(rng, (2, 4, 16, 16))
    # temp_alpha != 0 -> no shock term
    v = float(L.k1_loss(jnp.asarray(pred), jnp.asarray(true), temp_alpha=1.0, k1_alpha=0.0))
    ref = float(L.weighted_l1_distance(jnp.asarray(pred), jnp.asarray(true)))
    assert abs(v - ref) < 1e-6


def test_transform():
    x = jnp.asarray([0.0, 0.5, 1.0])
    out = np.asarray(L.transform(x))
    ref = 0.036 * 10 ** ((np.array([0, 0.5, 1.0]) * 255 / 3) * 0.0625)
    np.testing.assert_allclose(ref, out, rtol=1e-5)
