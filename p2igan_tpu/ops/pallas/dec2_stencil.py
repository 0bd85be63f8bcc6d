"""Fused Cout=1 3x3x3 conv + bias + sigmoid (the simple family's dec2).

Reference op being replaced: the final ``nn.Conv3d(hidden, 1, 3, padding=1)``
+ ``nn.Sigmoid`` of ``p2igan_bench/models/simple.py:30-38``. A one-channel
output starves the MXU (XLA lowers it as a ~0.77 TF/s VPU loop); the round-4
S-matrix reformulation (models/simple.py::_dec2_smatrix) fixed the matmul but
still materializes the (27, B*T, H, W) tap tensor through HBM, so it runs at
~5x its bandwidth floor (3.6 ms vs ~0.7 ms for the 8x16x128x128x64 serving
chunk).

Here the 27 tap planes never leave VMEM. Layout is everything on TPU, so the
kernel is built around three tricks:

1. **Pixel-pair packing.** x is viewed as (B*T, H, W/2, 2C) — a free
   reshape — so the f32 input block is exactly 4 MB with no lane padding
   (a (..., 64)-minor block would pad to 128 lanes and double it, blowing
   the 16 MB VMEM budget). The channel matmul uses a 2C-wide weight matrix
   whose two lane halves hold the even/odd-pixel taps.
2. **Shift-uniform row ordering.** In pair space a (dy, dx) tap shift
   decomposes into a lane shift of (dy-1)*W/2 + {-1, 0, +1}. The weight
   rows are ordered so that, per dy, all rows sharing a pair-shift are
   contiguous: one 12-row block (shift 0) and two 3-row blocks (+-1). The
   9-shift stencil then reduces to three full-block shifted adds per dy —
   no per-row extraction, full sublane utilization.
3. **dt-groups as separate outputs.** The three temporal tap groups of each
   slice belong to three different output frames (y_{u-1}, y_u, y_{u+1}).
   Instead of carrying a ring buffer across grid steps, the kernel writes
   the per-slice group sums as a (J, 3, 2, W*H/2) tensor (25 MB — noise)
   and one fused XLA pass outside shift-aligns them over t, applies the
   window-edge masks (each window's t=0 / t=T-1 zero padding), adds the
   bias, takes the sigmoid, and un-packs the pixel pairs.

HBM traffic: one f32 read of x + ~3x the (small) output = the ~0.9 ms floor.

Precision (measured on v5e against an f64 oracle): the channel matmul runs
at Precision.HIGHEST (Mosaic's f32 multi-pass decomposition), making this
kernel ~1500x MORE accurate than the XLA conv lowering it replaces — XLA's
f32 Conv3d on TPU is bf16-grade (max err 1.4e-3 through the sigmoid at
C=8; ~5e-3 at C=64) while this kernel lands at 9.1e-7. On-TPU comparisons
against conv3d therefore differ by the conv's own bf16 noise; the CPU
tests (f32 end-to-end on both sides) pin exact semantics at 1e-5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 64  # 54 ordered tap rows zero-padded to a sublane multiple

# Row layout, per dy (18 rows): a 12-row pair-shift-0 block of
# (target-parity e, dx, source-parity e') cases x 3 dt, then the 3-row
# shift -1 block (e=0 reading the left neighbor pair) and the 3-row
# shift +1 block (e=1 reading the right one).
_CASES_A = ((0, 1, 0), (0, 2, 1), (1, 0, 0), (1, 1, 1))  # (e, dx, e')
_CASE_B = (0, 0, 1)   # e=0, dx=0 -> odd source pixel of pair p-1
_CASE_C = (1, 2, 0)   # e=1, dx=2 -> even source pixel of pair p+1


def _kernel(x_ref, kc_ref, out_ref, sp, *, J, H, W2, C):
    u = pl.program_id(0)
    Q = H * W2
    P = W2 + 1

    @pl.when(u == 0)
    def _init_pads():
        sp[:, :P] = jnp.zeros((ROWS, P), jnp.float32)
        sp[:, P + Q:] = jnp.zeros((ROWS, sp.shape[1] - P - Q), jnp.float32)

    x = x_ref[0].reshape(Q, 2 * C)  # free merge: W2 % 8 == 0
    sp[:, P:P + Q] = jax.lax.dot_general(
        kc_ref[:], x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    acc_a = jnp.zeros((12, Q), jnp.float32)
    acc_b = jnp.zeros((8, Q), jnp.float32)
    acc_c = jnp.zeros((8, Q), jnp.float32)
    for dy in range(3):
        off = P + (dy - 1) * W2
        r = dy * 18
        acc_a = acc_a + sp[r:r + 12, off:off + Q]
        acc_b = acc_b + sp[r + 8:r + 16, off - 1:off - 1 + Q]
        acc_c = acc_c + sp[r + 10:r + 18, off + 1:off + 1 + Q]
    # acc_b rows 4..6 are the B block (12..14 within the dy group); acc_c
    # rows 5..7 are the C block (15..17). The 8-row reads keep sublane
    # alignment; the stray rows are never used.
    pcol = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1) % W2
    acc_b = jnp.where(pcol > 0, acc_b, 0.0)
    acc_c = jnp.where(pcol < W2 - 1, acc_c, 0.0)

    # out rows: (dt, e) -> g_dt for target parity e.
    for dt in range(3):
        out_ref[0, dt, 0:1] = (acc_a[dt:dt + 1, :] + acc_a[3 + dt:4 + dt, :]
                               + acc_b[4 + dt:5 + dt, :])
        out_ref[0, dt, 1:2] = (acc_a[6 + dt:7 + dt, :] + acc_a[9 + dt:10 + dt, :]
                               + acc_c[5 + dt:6 + dt, :])


@functools.partial(jax.jit, static_argnames=())
def _dec2_pallas(xp, kc):
    J, H, W2, C2 = xp.shape
    C = C2 // 2
    Q = H * W2
    kernel = functools.partial(_kernel, J=J, H=H, W2=W2, C=C)
    flops = J * Q * (2 * 54 * C2 // 2 + 2 * 54)
    bytes_accessed = xp.size * 4 + J * 3 * 2 * Q * 4 + kc.size * 4
    return pl.pallas_call(
        kernel,
        grid=(J,),
        cost_estimate=pl.CostEstimate(flops=flops, transcendentals=0,
                                      bytes_accessed=bytes_accessed),
        in_specs=[
            pl.BlockSpec((1, H, W2, C2), lambda u: (u, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, C2), lambda u: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, 2, Q), lambda u: (u, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((J, 3, 2, Q), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ROWS, Q + 2 * (W2 + 1)), jnp.float32)],
    )(xp, kc)


def _pack_weights(kernel: jax.Array) -> jax.Array:
    """(3,3,3,C,1) -> (ROWS, 2C) in the kernel's shift-uniform row order.

    Trace-safe (jnp scatter, not numpy): the driver may trace this with the
    kernel as a jit argument rather than a closed-over constant.
    """
    k = kernel[..., 0].astype(jnp.float32)  # (dt, dy, dx, C)
    c = k.shape[-1]
    kc = jnp.zeros((ROWS, 2 * c), jnp.float32)
    for dy in range(3):
        r = dy * 18
        cases = ([(r + case * 3, e, dx, esrc)
                  for case, (e, dx, esrc) in enumerate(_CASES_A)]
                 + [(r + 12, *_CASE_B), (r + 15, *_CASE_C)])
        for r0, _e, dx, esrc in cases:
            for dt in range(3):
                kc = kc.at[r0 + dt, esrc * c:(esrc + 1) * c].set(k[dt, dy, dx])
    return kc


def conv3d_cout1_sigmoid(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                         use_pallas: bool | None = None) -> jax.Array:
    """sigmoid(conv3d(x, kernel, SAME, bias)) for a (3,3,3,C,1) kernel.

    x: (B, T, H, W, C) float32. Returns (B, T, H, W, 1) float32, matching
    XLA's own f32 conv numerics. Falls back to the S-matrix formulation
    off-TPU or for shapes the kernel doesn't tile.
    """
    from ..idw import default_use_pallas

    b, t, h, w, c = x.shape
    if (not default_use_pallas(use_pallas) or w % 16 != 0
            or (h * w // 2) % 128 != 0 or h < 3 or w < 4):
        from ...models.simple import SimpleGenerator
        y = SimpleGenerator._dec2_smatrix(x.astype(jnp.float32),
                                          kernel.astype(jnp.float32),
                                          bias.astype(jnp.float32))
        return jax.nn.sigmoid(y)

    J, w2, q = b * t, w // 2, h * (w // 2)
    xp = x.astype(jnp.float32).reshape(J, h, w2, 2 * c)  # free pair packing
    out = _dec2_pallas(xp, _pack_weights(kernel))  # (J, 3, 2, Q)

    # Shift-align the dt groups over t, masking each window's edges.
    o0, o1, o2 = out[:, 0], out[:, 1], out[:, 2]
    zero = jnp.zeros_like(o1[:1])
    o2s = jnp.concatenate([o2[1:], zero], axis=0)      # g2 of slice t+1
    o0s = jnp.concatenate([zero, o0[:-1]], axis=0)     # g0 of slice t-1
    tmod = (jnp.arange(J) % t)[:, None, None]
    y = (o1 + jnp.where(tmod != t - 1, o2s, 0.0)
         + jnp.where(tmod != 0, o0s, 0.0))
    y = jax.nn.sigmoid(y + bias[0])
    # Un-pack pixel pairs: (J, 2, Q) -> (J, H, W2, 2) -> (B, T, H, W, 1).
    y = y.reshape(J, 2, h, w2).transpose(0, 2, 3, 1)
    return y.reshape(b, t, h, w, 1)
