"""Inventory-completeness layers: BasicConv, SimAM, FFT blocks, STABED."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from p2igan_tpu.metrics import metric as M
from p2igan_tpu.ops.doconv import SimAM
from p2igan_tpu.ops.layers import (BasicConv, FFTBenchComplexConv, LayerNorm2d,
                                   ResBlockDOFFT, STABEDBlock)


def test_basic_conv_variants(rng):
    x = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    m = BasicConv(3, 6, 3, norm=True, relu=True)
    v = m.init(jax.random.key(0), x)
    out, upd = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 8, 8, 6)
    assert float(jnp.min(out)) >= 0.0
    # transposed variant doubles spatial dims (k=4, s=2, p=1)
    mt = BasicConv(3, 6, 4, stride=2, transpose=True, relu=False, use_bias=True)
    vt = mt.init(jax.random.key(0), x)
    out = mt.apply(vt, x)
    assert out.shape == (2, 16, 16, 6)


def test_simam_matches_torch(rng):
    x = rng.normal(size=(2, 6, 6, 4)).astype(np.float32)
    out = SimAM().apply({}, jnp.asarray(x))
    # torch replica of the energy formula (deconv_pytorch.py:217-222)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    n = 6 * 6 - 1
    mu = xt.mean(dim=[2, 3], keepdim=True)
    sq = (xt - mu).pow(2)
    y = sq / (4 * (sq.sum(dim=[2, 3], keepdim=True) / n + 1e-4)) + 0.5
    ref = (xt * torch.sigmoid(y)).numpy()
    np.testing.assert_allclose(np.transpose(ref, (0, 2, 3, 1)), np.asarray(out),
                               atol=1e-5)


def test_fft_resblock_runs(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 16)).astype(np.float32))
    m = ResBlockDOFFT(16)
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    m2 = FFTBenchComplexConv(16)
    v2 = m2.init(jax.random.key(0), x)
    assert m2.apply(v2, x).shape == x.shape


def test_layernorm2d_matches_torch_groupnorm(rng):
    x = rng.normal(size=(2, 5, 5, 8)).astype(np.float32)
    m = LayerNorm2d(8)
    v = m.init(jax.random.key(0), jnp.asarray(x))
    out = np.asarray(m.apply(v, jnp.asarray(x)))
    gn = torch.nn.GroupNorm(1, 8)
    ref = gn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).detach().numpy()
    np.testing.assert_allclose(np.transpose(ref, (0, 2, 3, 1)), out, atol=1e-5)
    m2 = STABEDBlock(8, 4)
    v2 = m2.init(jax.random.key(0), jnp.asarray(x))
    assert m2.apply(v2, jnp.asarray(x)).shape == (2, 5, 5, 4)


def test_loss_metrics_accumulate(rng):
    preds = jnp.asarray(rng.random((2, 4, 8, 8)).astype(np.float32))
    target = jnp.asarray(rng.random((2, 4, 8, 8)).astype(np.float32))
    st = M.loss_metric_init()
    st = M.weighted_l1_metric_update(st, preds, target)
    st = M.weighted_l1_metric_update(st, preds, target)
    from p2igan_tpu.losses import weighted_l1_distance

    ref = float(weighted_l1_distance(preds, target))
    assert abs(M.loss_metric_compute(st) - ref) < 1e-6
    st2 = M.loss_metric_init()
    st2 = M.k1_loss_metric_update(st2, preds, target, temp_alpha=1.0, k1_alpha=0.0)
    assert np.isfinite(M.loss_metric_compute(st2))
    st3 = M.loss_metric_init()
    st3 = M.shock_difference_metric_update(st3, preds, target)
    assert np.isfinite(M.loss_metric_compute(st3))


def test_uppos_fold_gate_parity(rng):
    """Serving fold: W(x * 2sig(pos)) == 2sig(pos) * (W x) + bias ordering."""
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.ops.layers import UPPos

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    mod = UPPos(16, 8, 16, 16)
    vars_ = mod.init(jax.random.key(0), x)
    # non-zero pos so the gate actually does something
    vars_ = jax.tree_util.tree_map(
        lambda v: v + 0.3 if v.shape == (1, 16, 16, 1) else v, vars_)
    want = mod.apply(vars_, x)
    got = UPPos(16, 8, 16, 16, fold_gate=True).apply(vars_, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
