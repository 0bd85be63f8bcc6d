"""Fused tiny-Cin 3x3x3 conv + bias + LeakyReLU (the simple family's enc0).

Reference op being replaced: the first ``nn.Conv3d(2, 64, 3, padding=1)`` of
``p2igan_bench/models/simple.py:7-13,30`` applied to cat(masked, mask). XLA
lowers a Cin=2 Conv3d as a ~3.5 TF/s VPU loop; the round-4 im2col
reformulation (models/simple.py::_conv3d_im2col) fixed the matmul but
materializes the (B*T*H*W, 54) tap matrix through HBM (~450 MB per serving
chunk, written + read), so it still runs ~5x above the family's bandwidth
floor (4.0 ms vs ~0.7 ms, which is simply the unavoidable (B,T,H,W,64)
output write).

Here the tap matrix never leaves VMEM. The input planes are tiny (a t-slice
at Cin=2 is 131 KB), so each grid step loads the full prev/cur/next t-slices
(clamped index maps; out-of-window dt rows are zeroed by the t%T masks, so
the clamp never leaks a neighboring window's frame), builds the
(27*Cin, HW-block) tap matrix X from 9 lane-shifted copies of the stacked
planes, and runs one MXU matmul against the (27*Cin, Cout) weight matrix
with bias + leaky_relu fused in the epilogue. The output is written in
h-split blocks to bound VMEM. HBM traffic: read x ~3 times (tiny), write the
output once — the 0.7 ms floor.

BatchNorm folding: callers fold the BN running-stats affine into
kernel/bias first (SimpleGenerator.fold_for_inference), so the conv epilogue
here is the whole block.

Precision: the tap matmul runs at Precision.HIGHEST (Mosaic's f32
multi-pass decomposition) — like dec2_stencil.py, this is MORE accurate
than XLA's own TPU conv lowering, which is bf16-grade (see that module's
measured numbers); the CPU tests pin exact f32 semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(xp_ref, xc_ref, xn_ref, k_ref, b_ref, out_ref, xbuf, sps, *,
            J, T, H, W, NH, cin, cout, slope):
    j = pl.program_id(0)
    hb = pl.program_id(1)
    HW = H * W
    HWB = HW // NH
    # Lane pad: >= W+1 (largest shift) and 128-aligned, because Mosaic
    # requires dynamic lane offsets (the h-block start below) to be provable
    # 128-multiples: the dynamic slice grabs an aligned window, the +-shift
    # lands via a static sub-slice.
    L = _round_up(W + 2, 128)
    rows = 3 * cin  # (dt, c) rows of the stacked planes

    @pl.when((j == 0) & (hb == 0))
    def _zero_pads():
        # xbuf pad rows are only ever read (against zero weight rows) and
        # the sps lane pads only as shift zeros; uninitialized VMEM could
        # hold NaNs, so zero both once.
        if 9 * rows < xbuf.shape[0]:
            xbuf[9 * rows:, :] = jnp.zeros(
                (xbuf.shape[0] - 9 * rows, xbuf.shape[1]), jnp.float32)
        sps[:, :L] = jnp.zeros((rows, L), jnp.float32)
        sps[:, L + HW:] = jnp.zeros((rows, sps.shape[1] - L - HW),
                                    jnp.float32)

    @pl.when(hb == 0)
    def _build_planes():
        stack = jnp.concatenate(
            [xp_ref[0], xc_ref[0], xn_ref[0]], axis=0)  # (3*cin, HW), dt-major
        tmod = j % T
        rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        valid = (((tmod != 0) | (rowi >= cin))          # dt=0: window t-edge
                 & ((tmod != T - 1) | (rowi < 2 * cin)))  # dt=2
        sps[:, L:L + HW] = jnp.where(valid, stack, 0.0)

    wcol = jax.lax.broadcasted_iota(jnp.int32, (1, HWB), 1) % W
    h0 = hb * HWB  # multiple of HWB, itself a multiple of 128
    win = sps[0:rows, pl.ds(h0, HWB + 2 * L)]  # abs lanes [h0, h0+HWB+2L)
    for dy in range(3):
        for dx in range(3):
            off = L + (dy - 1) * W + (dx - 1)  # static within the window
            sl = win[:, off:off + HWB]
            if dx == 0:
                sl = jnp.where(wcol > 0, sl, 0.0)
            elif dx == 2:
                sl = jnp.where(wcol < W - 1, sl, 0.0)
            r0 = (dy * 3 + dx) * rows
            xbuf[r0:r0 + rows, :] = sl

    # HIGHEST = Mosaic's bf16x3 f32 decomposition, matching XLA's own f32
    # conv/matmul numerics (default would truncate to one bf16 pass).
    y = jax.lax.dot_general(xbuf[:], k_ref[:], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)  # (HWB, cout)
    y = y + b_ref[0]
    y = jnp.maximum(y, slope * y)
    out_ref[0] = y.reshape(H // NH, W, cout)


@functools.partial(jax.jit, static_argnames=("T", "NH", "slope"))
def _enc0_pallas(x, kmat, bias, T: int, NH: int, slope: float):
    J, cin, H, W = x.shape
    rows9, cout = kmat.shape
    HW = H * W
    x = x.reshape(J, cin, HW)  # free: lanes stay the minor (h, w) run
    kernel = functools.partial(_kernel, J=J, T=T, H=H, W=W, NH=NH,
                               cin=cin, cout=cout, slope=slope)
    flops = J * HW * (2 * 27 * cin * cout + 3 * cout)
    bytes_accessed = 3 * x.size * 4 + J * HW * cout * 4 + kmat.size * 4
    out = pl.pallas_call(
        kernel,
        grid=(J, NH),
        cost_estimate=pl.CostEstimate(flops=flops, transcendentals=0,
                                      bytes_accessed=bytes_accessed),
        in_specs=[
            pl.BlockSpec((1, cin, HW),
                         lambda j, hb: (jnp.maximum(j - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin, HW), lambda j, hb: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin, HW),
                         lambda j, hb: (jnp.minimum(j + 1, J - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows9, cout), lambda j, hb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda j, hb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H // NH, W, cout),
                               lambda j, hb: (j, hb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((J, H, W, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows9, HW // NH), jnp.float32),
            pltpu.VMEM((3 * cin, HW + 2 * _round_up(W + 2, 128)), jnp.float32),
        ],
    )(x, x, x, kmat, bias)
    return out


def enc0_conv3d_leaky(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                      slope: float = 0.2,
                      use_pallas: bool | None = None) -> jax.Array:
    """leaky_relu(conv3d(x, kernel, SAME, bias), slope) fused for tiny Cin.

    x: (B, T, H, W, Cin) with Cin <= 4; kernel: (3, 3, 3, Cin, Cout).
    Returns (B, T, H, W, Cout) float32. Falls back to the im2col matmul
    formulation off-TPU or for shapes the kernel doesn't tile.
    """
    from ..idw import default_use_pallas

    b, t, h, w, cin = x.shape
    cout = kernel.shape[-1]
    if (not default_use_pallas(use_pallas) or w % 8 != 0 or cin > 4
            or (h * w) % 256 != 0 or h % 2 != 0 or h < 3 or w < 3
            or cout % 8 != 0):
        from ...models.simple import _conv3d_im2col
        y = _conv3d_im2col(x.astype(jnp.float32),
                           kernel.astype(jnp.float32),
                           bias.astype(jnp.float32))
        return jnp.maximum(y, slope * y)

    # h-split the output so a block stays <= ~1 MB after lane padding: the
    # block is double-buffered AND the kernel's y value + HIGHEST-precision
    # matmul temporaries are all proportional to it (a 4 MB target measured
    # 25 MB scoped VMEM at the 128^2x64 serving shape — OOM).
    cpad = _round_up(cout, 128) if cout < 128 else cout
    NH = 1
    while (h % (NH * 2) == 0 and (h // NH) * w * cpad * 4 > (1 << 20)):
        NH *= 2

    # Weight rows ordered to match the kernel's tap matrix:
    # row = (3*dy + dx)*3*cin + dt*cin + c. (jnp, trace-safe)
    km = jnp.transpose(kernel.astype(jnp.float32), (1, 2, 0, 3, 4))
    kmat = km.reshape(27 * cin, cout)
    rows9 = _round_up(27 * cin, 8)
    if rows9 != 27 * cin:
        kmat = jnp.concatenate(
            [kmat, jnp.zeros((rows9 - 27 * cin, cout), jnp.float32)], 0)
    xt = x.astype(jnp.float32).reshape(b * t, h, w, cin).transpose(0, 3, 1, 2)
    out = _enc0_pallas(xt, kmat, jnp.asarray(bias, jnp.float32).reshape(1, cout),
                       T=t, NH=NH, slope=float(slope))
    return out.reshape(b, t, h, w, cout)
