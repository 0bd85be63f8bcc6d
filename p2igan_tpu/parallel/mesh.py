"""Device mesh and sharding setup.

The reference is single-process/single-device (reference ``scripts/train.py:102``,
no ``torch.distributed`` anywhere). The TPU-native design makes data
parallelism first-class: a 1-D ``data`` mesh axis over all local devices (with
an optional ``model`` axis for completeness), batches sharded over ``data``,
parameters replicated, and gradient/metric reduction expressed as ``psum``-style
XLA collectives inserted by ``jit`` from sharding annotations — these ride ICI
within a slice.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    axes: Tuple[str, ...] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a device mesh. Default: all devices on one ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> Tuple[np.ndarray, int]:
    """Pad the batch axis to a multiple of the data-axis size.

    Returns (padded, n_valid). Padding repeats the last element so every shard
    sees well-formed data; callers mask out the padding in reductions.
    """
    n = x.shape[axis]
    rem = n % multiple
    if rem == 0:
        return x, n
    pad_n = multiple - rem
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(n - 1, n)
    pad = np.repeat(x[tuple(idx)], pad_n, axis=axis)
    return np.concatenate([x, pad], axis=axis), n


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put a pytree of host arrays with batch-dim sharding."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def model_sharded_params(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Tensor-parallel parameter placement: shard each kernel's trailing
    (output-channel) dim over the ``model`` axis, replicate the rest.

    The models here are small enough that TP is never required (SURVEY
    §2.3) — this is the completeness hook: under ``jit``, GSPMD propagates
    the channel sharding through the convs and inserts the all-gathers /
    reduce-scatters itself (HWIO kernels shard on O; 1-D params such as
    biases and spectral-norm ``u`` stay replicated because an uneven or
    tiny trailing dim falls back to replication).
    """
    n = mesh.shape[axis]

    def _sharding(x: jax.Array) -> NamedSharding:
        if x.ndim >= 2:
            # O's position is determined by LAYOUT, not divisibility:
            # HWIO/DHWIO kernels (ndim >= 4) carry O trailing; DOConv's
            # factored 3-D leaves — W (O, I/g, M*N) and D (Cin, M*N, D_mul)
            # — carry their shardable channel dim LEADING (a divisibility
            # preference would shard the contracted M*N/D_mul dims whenever
            # the mesh size divides 9, inserting reshard collectives inside
            # every DOConv compose); 2-D dense kernels carry O trailing.
            dim = 0 if x.ndim == 3 else x.ndim - 1
            if x.shape[dim] % n == 0 and x.shape[dim] >= n:
                spec = [None] * x.ndim
                spec[dim] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, _sharding(x)), params)
