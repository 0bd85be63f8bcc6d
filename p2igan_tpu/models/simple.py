"""Simple 3D-conv encoder/decoder baseline (reference models/simple.py)."""

from __future__ import annotations



import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.convs import conv3d, conv_transpose3d


def _torch_conv_init(key, shape, dtype=jnp.float32):
    """torch Conv default: kaiming_uniform(a=sqrt(5)) -> U(+-1/sqrt(fan_in))."""
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _conv3d_im2col(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """Stride-1 SAME 3x3x3 conv as one dense im2col matmul.

    XLA lowers tiny-Cin Conv3d (e.g. the cat(masked, mask) Cin=2 input stage)
    to a VPU multiply loop at ~3.5 TF/s on v5e; building the 27*Cin tap
    columns explicitly and contracting them in a single (B*T*H*W, 27*Cin) @
    (27*Cin, Cout) matmul keeps the work on the MXU. Measured at the serving
    chunk (8x16x128x128, Cin=2->64): 7.1 -> 4.0 ms, bit-exact vs the conv.
    """
    b, t, h, w, cin = x.shape
    kd, kh, kw, _, cout = kernel.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dt:dt + t, dy:dy + h, dx:dx + w, :]
            for dt in range(kd) for dy in range(kh) for dx in range(kw)]
    cols = jnp.concatenate(cols, axis=-1)  # (B,T,H,W, 27*Cin), tap-major
    wmat = kernel.reshape(kd * kh * kw * cin, cout)
    return jnp.einsum("bthwk,kc->bthwc", cols, wmat) + bias


class Conv3dBlock(nn.Module):
    """Conv3d -> BatchNorm3d -> LeakyReLU(0.2) (reference simple.py:7-13)."""

    cin: int
    cout: int
    stride: int = 1
    # Serving-only: stride-1 conv as an im2col MXU matmul (see _conv3d_im2col)
    im2col: bool = False
    # Serving-only (fold_for_inference): the BN running-stats affine has been
    # folded into kernel/bias host-side, so the block is conv -> leaky only.
    # Saves one full elementwise pass over the (B,T,H,W,Cout) activation.
    folded: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kernel = self.param("kernel", _torch_conv_init, (3, 3, 3, self.cin, self.cout))
        bias = self.param("bias", nn.initializers.zeros, (self.cout,))
        if self.folded and self.im2col and self.stride == 1:
            # Fully fused tiny-Cin conv + (folded) BN + leaky in VMEM.
            from ..ops.pallas.enc0_conv import enc0_conv3d_leaky
            return enc0_conv3d_leaky(x, kernel, bias, slope=0.2)
        if self.im2col and self.stride == 1:
            x = _conv3d_im2col(x, kernel.astype(x.dtype), bias.astype(x.dtype))
        else:
            x = conv3d(x, kernel.astype(x.dtype), stride=self.stride, padding=1,
                       bias=bias.astype(x.dtype))
        if not self.folded:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn")(x)
        return jax.nn.leaky_relu(x, 0.2)


class SimpleGenerator(nn.Module):
    """masked/masks: (B, T, H, W, C) -> (B, T, H, W, C) in [0, 1]."""

    in_channels: int = 1
    out_channels: int = 1
    base_channels: int = 64
    # Serving-only (set by fold_for_inference): MXU-friendly reformulations
    # of the two channel-starved stages. XLA lowers the Cin=2 input conv and
    # the Cout=1 output conv as VPU loop fusions (0.4-0.8 TF/s on v5e); the
    # dense middle convs are fine (~193 TF/s). See _conv3d_im2col and the
    # dec2 S-matrix below. Forward-only; training keeps the plain convs.
    serving: bool = False
    # Opt-in: the fused Pallas dec2 stencil kernel (ops/pallas/dec2_stencil).
    # Its standalone microbench beats the S-matrix, but in the full serving
    # program it LOSES end-to-end — 39.4 vs 45.7 ev/s measured on v5e
    # (round-5 A/B, PROFILE.md "simple dec2 regression"): the (J,3,2,Q)
    # intermediate + shift-align/unpack epilogue costs more HBM traffic and
    # relayouts than the S-matrix's tap planes. Kept for its f32 accuracy
    # (9.1e-7 vs the conv's bf16-grade 5e-3) and as the measured dead end.
    dec2_pallas: bool = False

    def fold_for_inference(self, variables):
        """Serving-path hook (same protocol as P2IGenerator/DKGenerator):
        switch on the MXU reformulations and fold each encoder block's BN
        running-stats affine into its conv kernel/bias —
        ``bn(conv(x) + b) == conv(x; W*s) + ((b - mean)*s + beta)`` with
        ``s = gamma / sqrt(var + eps)`` — removing one elementwise pass over
        every (B,T,H,W,Cout) activation. Reassociates one multiply per tap
        (parity rtol ~1e-6; see test_simple_generator_serving_parity)."""
        params = dict(variables["params"])
        stats = variables.get("batch_stats", {})
        for blk in ("enc0", "enc1", "enc2"):
            p = dict(params[blk])
            bn = p.pop("bn")
            st = stats[blk]["bn"]
            s = bn["scale"] / jnp.sqrt(st["var"] + 1e-5)
            p["kernel"] = p["kernel"] * s
            p["bias"] = (p["bias"] - st["mean"]) * s + bn["bias"]
            params[blk] = p
        return self.clone(serving=True), {"params": params}

    @nn.compact
    def __call__(self, masked_video: jax.Array, masks: jax.Array,
                 train: bool = False) -> jax.Array:
        hidden = self.base_channels
        x = jnp.concatenate([masked_video, masks.astype(masked_video.dtype)], axis=-1)
        x = Conv3dBlock(self.in_channels * 2, hidden, im2col=self.serving,
                        folded=self.serving, name="enc0")(x, train)
        x = Conv3dBlock(hidden, hidden * 2, stride=2, folded=self.serving,
                        name="enc1")(x, train)
        x = Conv3dBlock(hidden * 2, hidden * 4, stride=2, folded=self.serving,
                        name="enc2")(x, train)

        k0 = self.param("dec0_kernel", _torch_conv_init, (2, 2, 2, hidden * 2, hidden * 4))
        b0 = self.param("dec0_bias", nn.initializers.zeros, (hidden * 2,))
        x = jax.nn.relu(conv_transpose3d(x, k0.astype(x.dtype), stride=2,
                                         bias=b0.astype(x.dtype)))
        k1 = self.param("dec1_kernel", _torch_conv_init, (2, 2, 2, hidden, hidden * 2))
        b1 = self.param("dec1_bias", nn.initializers.zeros, (hidden,))
        x = jax.nn.relu(conv_transpose3d(x, k1.astype(x.dtype), stride=2,
                                         bias=b1.astype(x.dtype)))
        k2 = self.param("dec2_kernel", _torch_conv_init, (3, 3, 3, hidden, self.out_channels))
        b2 = self.param("dec2_bias", nn.initializers.zeros, (self.out_channels,))
        if self.serving and self.out_channels == 1:
            if self.dec2_pallas:
                from ..ops.pallas.dec2_stencil import conv3d_cout1_sigmoid
                return conv3d_cout1_sigmoid(x, k2, b2)
            y = self._dec2_smatrix(x, k2.astype(x.dtype), b2.astype(x.dtype))
            return jax.nn.sigmoid(y)
        x = conv3d(x, k2.astype(x.dtype), padding=1, bias=b2.astype(x.dtype))
        return jax.nn.sigmoid(x)

    @staticmethod
    def _dec2_smatrix(x: jax.Array, k2: jax.Array, b2: jax.Array) -> jax.Array:
        """Final 3x3x3 conv (hidden -> 1) as channel matmul + 27-tap stencil.

        A Cout=1 Conv3d starves the MXU (one output lane); instead contract
        channels first — S[tap, p] = sum_c x[p, c] * k[tap, c] as one dense
        (B*T*H*W, C) @ (C, 27) matmul with the 27 taps PLANE-major so each
        tap is a contiguous (B,T,H,W) plane — then sum the 27 shifted planes.
        Measured at the serving chunk: 13.9 -> 3.6 ms, bit-exact vs the conv.
        """
        b, t, h, w, _ = x.shape
        kc = k2[..., 0].reshape(27, -1).T  # (C, 27), tap=(dt*3+dy)*3+dx
        s = jnp.einsum("bthwc,ck->kbthw", x, kc)
        sp = jnp.pad(s, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
        y = jnp.zeros((b, t, h, w), x.dtype)
        for tap in range(27):
            dt, rest = divmod(tap, 9)
            dy, dx = divmod(rest, 3)
            y = y + sp[tap, :, dt:dt + t, dy:dy + h, dx:dx + w]
        return (y + b2[0])[..., None]


class SimpleDiscriminator(nn.Module):
    """3D conv stack + global-average-pool linear head (simple.py:49-69)."""

    in_channels: int = 1
    base_channels: int = 64

    @nn.compact
    def __call__(self, video: jax.Array, train: bool = False,
                 update_stats: bool = False) -> jax.Array:
        del update_stats  # no spectral norm in the simple critic
        hidden = self.base_channels
        x = Conv3dBlock(self.in_channels, hidden, stride=2, name="f0")(video, train)
        x = Conv3dBlock(hidden, hidden * 2, stride=2, name="f1")(x, train)
        x = Conv3dBlock(hidden * 2, hidden * 4, stride=2, name="f2")(x, train)
        x = jnp.mean(x, axis=(1, 2, 3))  # AdaptiveAvgPool3d(1) + flatten
        w = self.param("head_kernel", _torch_conv_init, (hidden * 4, 1))
        b = self.param("head_bias", nn.initializers.zeros, (1,))
        return x @ w + b
