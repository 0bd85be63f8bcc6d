"""Loss library for precipitation GAN training (pure JAX).

Semantics match the reference ``p2igan_bench/modules/losses.py``:
NowcastNet-weighted L1, temperature-softmax KL temporal regularization,
spatial pooling, temporal-difference matching, Sobel+Laplacian shock maps,
and multi-mode adversarial losses (hinge / nsgan / lsgan).

Tensor layouts: losses are layout-free elementwise/reduction ops; functions
that need spatial structure take ``(B, T, H, W)`` (channel squeezed).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.convs import conv2d, max_pool2d, reflect_pad2d

__all__ = [
    "ReconstructionLoss",
    "reconstruction_loss",
    "gan_loss",
    "transform",
    "weighted_l1_distance",
    "softmax_temperature",
    "kl_divergence",
    "compute_forward_difference",
    "spatial_pool",
    "temporal_difference_matching_loss",
    "shock_map",
    "shock_map_loss",
    "k1_loss",
]


def transform(x: jax.Array) -> jax.Array:
    """Normalized rainfall -> mm scale (legacy helper, losses.py:51-53)."""
    return 0.036 * jnp.power(10.0, (x * 255.0 / 3.0) * 0.0625)


def weighted_l1_distance(x_pred: jax.Array, x_true: jax.Array) -> jax.Array:
    """NowcastNet weighted L1 (losses.py:56-65): w = a*exp(b*x)+c, capped at
    x_true > 0.70."""
    a, b, c = 0.50, 5.14, 0.12
    x_max = 0.70
    w_max = a * np.exp(b * x_max) + c
    w = a * jnp.exp(b * x_true) + c
    weight = jnp.where(x_true > x_max, w_max, w)
    return jnp.mean(weight * jnp.abs(x_pred - x_true))


def softmax_temperature(x: jax.Array, temperature: float) -> jax.Array:
    """Temperature softmax over all dims after the first two (losses.py:68-73)."""
    shape = x.shape
    flat = x.reshape(shape[0], shape[1], -1)
    out = jax.nn.softmax(flat / temperature, axis=-1)
    return out.reshape(shape)


def kl_divergence(p: jax.Array, q: jax.Array) -> jax.Array:
    """torch F.kl_div(p.log(), q, reduction='batchmean') (losses.py:76-80):
    sum(q * (log q - log p)) / batch_size, with q*log(q) := 0 at q == 0."""
    p = p.reshape(p.shape[0], p.shape[1], -1)
    q = q.reshape(q.shape[0], q.shape[1], -1)
    log_p = jnp.log(p)
    q_log_q = jnp.where(q > 0, q * jnp.log(jnp.where(q > 0, q, 1.0)), 0.0)
    return jnp.sum(q_log_q - q * log_p) / p.shape[0]


def compute_forward_difference(series: jax.Array) -> jax.Array:
    """Forward temporal difference along axis 1 (losses.py:83-85)."""
    return series[:, 1:] - series[:, :-1]


def reconstruction_loss(prediction: jax.Array, target: jax.Array,
                        k1_alpha: float = 0.0) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Weighted L1 + k1_alpha * KL of temperature-softmaxed temporal diffs
    (ReconstructionLoss, losses.py:32-48). The mask argument of the reference
    is accepted by callers but unused, as there."""
    pool_loss = weighted_l1_distance(prediction, target)
    pred_prob = softmax_temperature(compute_forward_difference(prediction), 0.1)
    true_prob = softmax_temperature(compute_forward_difference(target), 0.1)
    reg_loss = kl_divergence(pred_prob, true_prob)
    loss = pool_loss + k1_alpha * reg_loss
    return loss, {"pool": pool_loss, "reg": reg_loss}


class ReconstructionLoss:
    """Callable wrapper mirroring the reference class interface."""

    def __init__(self, k1_alpha: float = 0.0):
        self.k1_alpha = k1_alpha

    def __call__(self, prediction, target, mask=None):
        return reconstruction_loss(prediction, target, self.k1_alpha)


def spatial_pool(x: jax.Array) -> jax.Array:
    """MaxPool2d(k=5, s=4, p=2) over the trailing spatial dims of (B, T, H, W)."""
    B, T, H, W = x.shape
    y = max_pool2d(x.reshape(B * T, H, W, 1), 5, 4, padding=2)
    return y.reshape(B, T, y.shape[1], y.shape[2])


def temporal_difference_matching_loss(pred_diff: jax.Array, true_diff: jax.Array,
                                      true: jax.Array, beta: float = 1.0,
                                      eps: float = 1e-6) -> jax.Array:
    """Weighted matching of pooled temporal gradients (losses.py:94-109)."""
    pred_pool = spatial_pool(pred_diff)
    true_pool = spatial_pool(true_diff)
    base = spatial_pool(true[:, :-1])
    weight = 1.0 / (1.0 + beta * base + eps)
    return jnp.mean(((pred_pool - true_pool) ** 2) * weight)


def _shock_kernels(dtype):
    kx = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32) / 8.0
    ky = kx.T.copy()
    kl = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)
    to_hwio = lambda k: jnp.asarray(k, dtype).reshape(3, 3, 1, 1)  # noqa: E731
    return to_hwio(kx), to_hwio(ky), to_hwio(kl)


def _conv_reflect(x4: jax.Array, kernel: jax.Array) -> jax.Array:
    return conv2d(reflect_pad2d(x4, 1), kernel, padding=0)


def shock_map(x: jax.Array, beta: float = 30.0, eps: float = 1e-12) -> jax.Array:
    """Sobel-gradient x tanh(beta * Laplacian) structure map (losses.py:128-137).

    x: (B, T, H, W) -> same shape.
    """
    B, T, H, W = x.shape
    x4 = x.reshape(B * T, H, W, 1)
    kx, ky, kl = _shock_kernels(x.dtype)
    gx = _conv_reflect(x4, kx)
    gy = _conv_reflect(x4, ky)
    grad = jnp.sqrt(gx * gx + gy * gy + eps)
    lap = _conv_reflect(x4, kl)
    return (jnp.tanh(beta * lap) * grad).reshape(B, T, H, W)


def shock_map_loss(pred: jax.Array, true: jax.Array, beta: float = 30.0,
                   tau: float = 25.0, border_ignore: int = 0, pool: int = 2,
                   eps: float = 1e-12) -> jax.Array:
    """relu(|shock_true| - |shock_pred|) with optional pooling/border crop
    (losses.py:140-162). ``tau`` is a legacy no-op arg kept for interface parity."""
    del tau
    if pool > 1:
        B, T, H, W = pred.shape
        pred = max_pool2d(pred.reshape(B * T, H, W, 1), pool, pool)[..., 0] \
            .reshape(B, T, H // pool, W // pool)
        true = max_pool2d(true.reshape(B * T, H, W, 1), pool, pool)[..., 0] \
            .reshape(B, T, H // pool, W // pool)
    diff = jax.nn.relu(jnp.abs(shock_map(true, beta, eps)) -
                       jnp.abs(shock_map(pred, beta, eps)))
    if border_ignore > 0:
        m = border_ignore
        diff = diff[..., m:-m, m:-m]
    return diff


def k1_loss(pred: jax.Array, true: jax.Array, temp_alpha: float,
            k1_alpha: float) -> jax.Array:
    """Weighted pool + KL + shock-map combination (losses.py:165-189).

    pred/true: (B, T, H, W). Matches the reference's quirk that the shock term
    activates when temp_alpha == 0 (and then contributes 0 * shock).
    """
    pool_loss = weighted_l1_distance(pred, true)
    reg_loss = jnp.asarray(0.0, pred.dtype)
    shock_loss = jnp.asarray(0.0, pred.dtype)
    if k1_alpha > 0:
        pred_prob = softmax_temperature(compute_forward_difference(pred), 0.1)
        true_prob = softmax_temperature(compute_forward_difference(true), 0.1)
        reg_loss = kl_divergence(pred_prob, true_prob)
    if temp_alpha == 0:
        shock_loss = shock_map_loss(pred, true, beta=0.02, border_ignore=2, pool=1).mean()
    return pool_loss + k1_alpha * reg_loss + temp_alpha * shock_loss


def _bce(x: jax.Array, y: jax.Array) -> jax.Array:
    """torch BCELoss on probabilities, with torch's -100 log clamp."""
    log_x = jnp.maximum(jnp.log(x), -100.0)
    log_1mx = jnp.maximum(jnp.log(1.0 - x), -100.0)
    return jnp.mean(-(y * log_x + (1.0 - y) * log_1mx))


def gan_loss(outputs: jax.Array, target_is_real: bool, *,
             loss_type: str = "nsgan", is_disc: bool = False,
             target_real_label: float = 1.0, target_fake_label: float = 0.0) -> jax.Array:
    """Multi-mode adversarial loss (AdversarialLoss / gan_loss, losses.py:192-253).

    hinge — disc: mean(relu(1 -/+ out)); gen: mean(-out).
    nsgan — BCE vs label (reference applies BCELoss directly to D outputs).
    lsgan — MSE vs label.
    """
    if loss_type == "hinge":
        if is_disc:
            if target_is_real:
                return jnp.mean(jax.nn.relu(1.0 - outputs))
            return jnp.mean(jax.nn.relu(1.0 + outputs))
        return jnp.mean(-outputs)

    label = target_real_label if target_is_real else target_fake_label
    labels = jnp.full_like(outputs, label)
    if loss_type == "nsgan":
        return _bce(outputs, labels)
    if loss_type == "lsgan":
        return jnp.mean((outputs - labels) ** 2)
    raise ValueError(f"Unsupported GAN loss type: {loss_type}")
