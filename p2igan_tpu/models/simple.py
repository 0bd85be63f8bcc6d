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


class Conv3dBlock(nn.Module):
    """Conv3d -> BatchNorm3d -> LeakyReLU(0.2) (reference simple.py:7-13)."""

    cin: int
    cout: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kernel = self.param("kernel", _torch_conv_init, (3, 3, 3, self.cin, self.cout))
        bias = self.param("bias", nn.initializers.zeros, (self.cout,))
        x = conv3d(x, kernel.astype(x.dtype), stride=self.stride, padding=1,
                   bias=bias.astype(x.dtype))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         name="bn")(x)
        return jax.nn.leaky_relu(x, 0.2)


class SimpleGenerator(nn.Module):
    """masked/masks: (B, T, H, W, C) -> (B, T, H, W, C) in [0, 1]."""

    in_channels: int = 1
    out_channels: int = 1
    base_channels: int = 64

    @nn.compact
    def __call__(self, masked_video: jax.Array, masks: jax.Array,
                 train: bool = False) -> jax.Array:
        hidden = self.base_channels
        x = jnp.concatenate([masked_video, masks.astype(masked_video.dtype)], axis=-1)
        x = Conv3dBlock(self.in_channels * 2, hidden, name="enc0")(x, train)
        x = Conv3dBlock(hidden, hidden * 2, stride=2, name="enc1")(x, train)
        x = Conv3dBlock(hidden * 2, hidden * 4, stride=2, name="enc2")(x, train)

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
        x = conv3d(x, k2.astype(x.dtype), padding=1, bias=b2.astype(x.dtype))
        return jax.nn.sigmoid(x)


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
