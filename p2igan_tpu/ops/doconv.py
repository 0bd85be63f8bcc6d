"""Depthwise-over-parameterized convolution (DO-Conv), TPU-native.

Reference semantics: ``p2igan_bench/modules/deconv_pytorch.py:13-132``.
Training parameterization: ``W (out, in/groups, D_mul)`` and
``D (in, M*N, D_mul)`` with a constant identity offset ``D_diag``; the
effective kernel is

    DoW = reshape(einsum('ims,ois->oim', D + D_diag, W'), (out, in/g, M, N))

with ``W' = reshape(W, (out/g, in, D_mul))``. The compose step is a tiny
einsum XLA fuses into the conv's weight preparation; at inference the kernel
is folded once (``fold_doconv``) to a plain conv — reference
``DOConv2d_eval`` (deconv_pytorch.py:133-209).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def make_d_diag(in_channels: int, M: int, N: int, D_mul: int) -> np.ndarray:
    """Constant identity offset for D (deconv_pytorch.py:65-71).

    Exact reference arithmetic: reps = D_mul // (M*N) (no clamping), so a
    degenerate D_mul < M*N yields an all-zero (in, M*N, D_mul) offset —
    matching torch's repeat(0) + zero-pad — and the result width is always
    D_mul."""
    eye = np.eye(M * N, dtype=np.float32).reshape(1, M * N, M * N)
    reps = D_mul // (M * N)
    d_diag = np.tile(eye, (in_channels, 1, reps))
    if D_mul % (M * N) != 0:
        zeros = np.zeros((in_channels, M * N, D_mul % (M * N)), np.float32)
        d_diag = np.concatenate([d_diag, zeros], axis=2)
    return d_diag


def compose_doconv_kernel(W: jax.Array, D: jax.Array, D_diag: jax.Array,
                          out_channels: int, in_channels: int, groups: int,
                          M: int, N: int) -> jax.Array:
    """Compose the effective OIHW kernel, then transpose to HWIO for XLA."""
    D_mul = W.shape[-1]
    Dm = D + D_diag  # (in, M*N, D_mul)
    Wr = W.reshape(out_channels // groups, in_channels, D_mul)
    dow = jnp.einsum("ims,ois->oim", Dm, Wr)  # (out/g, in, M*N)
    dow = dow.reshape(out_channels, in_channels // groups, M, N)
    return jnp.transpose(dow, (2, 3, 1, 0))  # HWIO


def fold_doconv(W: np.ndarray, D: np.ndarray, D_diag: Optional[np.ndarray] = None) -> np.ndarray:
    """Fold factored (W, D) train params into a plain OIHW kernel (numpy, host).

    W: (out, in/g, D_mul); D: (in, M*N, D_mul). Returns (out, in/g, M, N)
    where M=N=sqrt(M*N) (square kernels only, as in the reference).
    """
    out_ch, in_per_g, D_mul = W.shape
    in_ch, MN, _ = D.shape
    groups = in_ch // in_per_g
    M = N = int(round(MN ** 0.5))
    if D_diag is None:
        D_diag = make_d_diag(in_ch, M, N, D_mul)
    Dm = D + D_diag
    Wr = W.reshape(out_ch // groups, in_ch, D_mul)
    dow = np.einsum("ims,ois->oim", Dm, Wr)
    return dow.reshape(out_ch, in_per_g, M, N)


def _kaiming_uniform_a5(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(a=sqrt(5)) on W (out, in/g, D_mul):
    bound = sqrt(6 / ((1 + 5) * fan_in)) = 1/sqrt(fan_in), fan_in = in/g * D_mul."""
    fan_in = shape[1] * shape[2]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class SimAM(nn.Module):
    """Parameter-free SimAM attention (reference deconv_pytorch.py:211-223):
    sigmoid energy weighting from per-channel spatial variance. x: (B,H,W,C)
    (used on DO-Conv kernels when ``simam=True``)."""

    e_lambda: float = 1e-4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        n = h * w - 1
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        sq = (x - mu) ** 2
        y = sq / (4 * (jnp.sum(sq, axis=(1, 2), keepdims=True) / n
                       + self.e_lambda)) + 0.5
        return x * jax.nn.sigmoid(y)


class DOConv2d(nn.Module):
    """DO-Conv layer. x: (B, H, W, Cin) -> (B, H', W', Cout).

    ``factored=True`` trains (W, D); ``factored=False`` is the eval variant
    holding a plain folded kernel (param name ``W`` with shape (M,N,in/g,out)).
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1
    use_bias: bool = False
    D_mul: Optional[int] = None
    factored: bool = True
    # eval-only fusion: expand the grouped kernel to a block-diagonal dense
    # one and add identity taps realizing `+ repeat_interleave(x, out/in)` —
    # XLA's grouped-conv + repeat lowering at this shape costs ~2 ms/event in
    # 5D layout copies (PROFILE.md); one dense 3x3 conv replaces all of it
    fuse_repeat_skip: bool = False
    # expand a grouped kernel to block-diagonal dense WITHOUT the repeat
    # skip. XLA lowers grouped convs at (B,128,128,C) through 5D
    # (groups, C/g) layouts — the grouped 1x1 ConvsOut costs 1.2 ms/event in
    # relayout copies + tiny-tile conv, and the grouped Convsin fwd/bwd
    # keeps ~7 ms/step of 5D layout churn in training (PROFILE.md per-op
    # traces); the dense expansion is numerically identical (off-block
    # zeros contribute exact 0). Valid under autodiff too: the VJP of the
    # block .set()s extracts exactly the on-block gradient slices, so
    # W/D gradients match the grouped conv's (off-block dense-kernel
    # gradients correspond to no parameter and are correctly dropped).
    dense_groups: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        M = N = self.kernel_size
        from .convs import conv2d

        if self.factored and M * N > 1:
            d_mul = self.D_mul or M * N
            W = self.param(
                "W", _kaiming_uniform_a5,
                (self.out_channels, self.in_channels // self.groups, d_mul),
            )
            D = self.param(
                "D", nn.initializers.zeros,
                (self.in_channels, M * N, d_mul),
            )
            d_diag = jnp.asarray(make_d_diag(self.in_channels, M, N, d_mul))
            kernel = compose_doconv_kernel(
                W, D, d_diag, self.out_channels, self.in_channels, self.groups, M, N
            )
        else:
            def _init_plain(key, shape, dtype=jnp.float32):
                # HWIO; torch fan_in = in/g * M * N
                fan_in = shape[0] * shape[1] * shape[2]
                bound = 1.0 / np.sqrt(fan_in)
                return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

            kernel = self.param(
                "W", _init_plain,
                (M, N, self.in_channels // self.groups, self.out_channels),
            )

        bias = None
        if self.use_bias:
            fan_in = (self.in_channels // self.groups) * (self.D_mul or M * N)
            bound = 1.0 / np.sqrt(fan_in)
            bias = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, minval=-bound, maxval=bound),
                (self.out_channels,),
            )

        groups = self.groups
        fuse_skip = (self.fuse_repeat_skip and not self.factored
                     and self.out_channels % self.in_channels == 0)
        if fuse_skip or (self.dense_groups and groups > 1):
            in_ch, out_ch = self.in_channels, self.out_channels
            in_g, out_g = in_ch // groups, out_ch // groups
            dense = jnp.zeros((M, N, in_ch, out_ch), kernel.dtype)
            for g in range(groups):
                dense = dense.at[:, :, g * in_g:(g + 1) * in_g,
                                 g * out_g:(g + 1) * out_g].set(
                    kernel[:, :, :, g * out_g:(g + 1) * out_g])
            if fuse_skip:
                r = out_ch // in_ch
                o_idx = jnp.arange(out_ch)
                dense = dense.at[M // 2, N // 2, o_idx // r, o_idx].add(1.0)
            kernel, groups = dense, 1

        kernel = kernel.astype(x.dtype)
        return conv2d(x, kernel, stride=self.stride, padding=self.padding,
                      groups=groups, bias=bias)
