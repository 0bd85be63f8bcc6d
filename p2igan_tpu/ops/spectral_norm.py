"""Spectral-normalized convolutions with explicit power-iteration state.

torch's ``nn.utils.spectral_norm`` (used by the reference discriminator,
``p2igan_bench/modules/layer.py:402-407`` and ``models/p2igan.py:120-142``)
keeps a ``u`` buffer updated in-place by one power iteration per training
forward. Here the iteration state is an explicit ``spectral`` variable
collection (carried in the train state and threaded functionally), matching
torch's update rule:

    v = normalize(W_mat^T u);  u' = normalize(W_mat v);  sigma = u'^T W_mat v
    W_sn = W / sigma

with ``W_mat = reshape(W_oihw, (out, -1))`` and eps=1e-12. When
``update_stats`` is False (eval), the stored ``u`` is used without updating.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _l2norm(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v / (jnp.linalg.norm(v) + eps)


def spectral_normalize(w_mat: jax.Array, u: jax.Array,
                       n_iter: int = 1) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One (or more) power iterations. w_mat: (out, K); u: (out,).

    Returns (sigma, new_u, new_v). As in torch, the iteration runs detached
    (u, v are buffers) but sigma = u^T W v keeps the gradient path through W.
    """
    wm = jax.lax.stop_gradient(w_mat)
    v = None
    for _ in range(n_iter):
        v = _l2norm(wm.T @ u)
        u = _l2norm(wm @ v)
    sigma = u @ (w_mat @ v)
    return sigma, u, v


def _kaiming_normal_leaky(key, shape, dtype=jnp.float32, a: float = 0.2):
    """torch kaiming_normal_(a, nonlinearity='leaky_relu') on HWIO/DHWIO kernels.

    fan_in = prod(spatial) * in_channels; gain = sqrt(2 / (1 + a^2)).
    (Reference P2IDiscriminator.init_weights, models/p2igan.py:150-155.)
    """
    fan_in = int(np.prod(shape[:-1]))
    gain = np.sqrt(2.0 / (1.0 + a * a))
    std = gain / np.sqrt(fan_in)
    return jax.random.normal(key, shape, dtype) * std


class SNConv(nn.Module):
    """Spectral-norm conv over 2D or 3D, torch-compatible math.

    x: (B, H, W, Cin) for ndim=2 or (B, T, H, W, Cin) for ndim=3.
    Kernel stored HWIO / DHWIO; the power-iteration matrix uses the torch
    OIHW flattening (out, in*kh*kw) so imported ``u`` vectors line up.
    """

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, ...] = (3, 3)
    stride: Tuple[int, ...] = (1, 1)
    padding: Tuple[int, ...] = (1, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False) -> jax.Array:
        ks = tuple(self.kernel_size)
        ndim = len(ks)
        kernel_shape = ks + (self.in_channels, self.out_channels)
        kernel = self.param("kernel", _kaiming_normal_leaky, kernel_shape)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,)) \
            if self.use_bias else None

        k_flat = int(np.prod(ks)) * self.in_channels
        # torch parity: u and v start as INDEPENDENT normalized gaussians
        # (torch.nn.utils.spectral_norm SpectralNorm.apply) — mutually
        # inconsistent until the first training-mode power iteration, like
        # the reference. Keys derive from the Flax init RNG so every layer
        # and every model seed gets its own vectors (previously hard-coded
        # key(0)/key(1) made all same-width layers share one u).
        if self.is_initializing():
            u_key, v_key = jax.random.split(self.make_rng("params"))
        else:  # never used: the variables already exist
            u_key = v_key = jax.random.key(0)
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2norm(jax.random.normal(
                u_key, (self.out_channels,), jnp.float32)),
        )
        v_var = self.variable(
            "spectral", "v",
            lambda: _l2norm(jax.random.normal(v_key, (k_flat,), jnp.float32)),
        )

        # torch weight matrix: OIHW -> (out, in*prod(k)); ours: HWIO/DHWIO.
        perm = (ndim + 1,) + (ndim,) + tuple(range(ndim))  # -> (O, I, *k)
        w_oihw = jnp.transpose(kernel, perm)
        w_mat = w_oihw.reshape(self.out_channels, -1).astype(jnp.float32)

        if update_stats:
            sigma, new_u, new_v = spectral_normalize(w_mat, u_var.value)
            if not self.is_initializing():
                u_var.value = jax.lax.stop_gradient(new_u)
                v_var.value = jax.lax.stop_gradient(new_v)
        else:
            # eval: use the stored buffers as-is (torch eval-mode semantics)
            u = jax.lax.stop_gradient(u_var.value)
            v = jax.lax.stop_gradient(v_var.value)
            sigma = u @ (w_mat @ v)

        kernel_sn = (kernel / sigma).astype(x.dtype)
        from .convs import conv2d, conv3d

        def _fit(v: Tuple[int, ...], name: str) -> Tuple[int, ...]:
            # the class defaults are 2D tuples; broadcast uniform values to
            # the kernel's rank so a 3D kernel with default stride/padding
            # doesn't crash deep inside lax.conv_general_dilated
            v = tuple(v)
            if len(v) == ndim:
                return v
            if len(set(v)) == 1:
                return (v[0],) * ndim
            raise ValueError(
                f"SNConv {name}={v} incompatible with {ndim}D kernel {ks}")

        stride = _fit(self.stride, "stride")
        padding = _fit(self.padding, "padding")
        if ndim == 2:
            out = conv2d(x, kernel_sn, stride=stride, padding=padding, bias=None)
        else:
            out = conv3d(x, kernel_sn, stride=stride, padding=padding, bias=None)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out


def C2(cin: int, cout: int, k: int = 3, s: int = 1, p: int = 1) -> SNConv:
    """Spectral-norm Conv2d factory (reference layer.py:402-403)."""
    return SNConv(cin, cout, kernel_size=(k, k), stride=(s, s), padding=(p, p))


def C3(cin: int, cout: int, kt: int = 3, ks: int = 3,
       st: Tuple[int, int, int] = (1, 1, 1), pt: Tuple[int, int, int] = (1, 1, 1)) -> SNConv:
    """Spectral-norm Conv3d factory (reference layer.py:406-407)."""
    return SNConv(cin, cout, kernel_size=(kt, ks, ks), stride=st, padding=pt)
