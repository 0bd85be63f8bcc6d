"""Golden parity: execute the REFERENCE's own torch code as the oracle.

Round 1 compared against hand-written torch replicas; these tests import
``/root/reference`` directly, build each reference model, export its real
``state_dict`` through ``models/torch_import.py``, and assert forward parity
on identical inputs (VERDICT item 2). Loss functions are compared against the
reference's executed ``ReconstructionLoss`` / ``gan_loss``.

Oracle targets: /root/reference/p2igan_bench/models/p2igan.py:72-173,
dk.py:172-197, stdk.py:149-186, simple.py:7-69, modules/losses.py:32-48 and
192-253. Tolerances are documented in BASELINE.md.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.slow


def _install_torchmetrics_stub() -> None:
    """torchmetrics is not installed; provide a FUNCTIONAL ``Metric`` base
    (add_state with reset-to-default semantics) so the reference's own
    metrics/metric.py can be EXECUTED as an oracle, plus a no-op SSIM
    (torchmetrics' gaussian SSIM would have to be re-implemented to stub it,
    which would make the oracle circular — the ssim key is excluded from
    the parity comparison instead; our SSIM is covered against a numpy
    reference in tests/test_metrics.py)."""
    if "torchmetrics" in sys.modules:
        return
    tm = types.ModuleType("torchmetrics")

    class Metric(torch.nn.Module):
        full_state_update = False

        def add_state(self, name, default=None, dist_reduce_fx=None):
            if not hasattr(self, "_state_defaults"):
                self._state_defaults = {}
            self._state_defaults[name] = (
                default.clone() if torch.is_tensor(default) else default)
            setattr(self, name, default)

        def reset(self):
            for name, default in getattr(self, "_state_defaults", {}).items():
                setattr(self, name,
                        default.clone() if torch.is_tensor(default) else default)
            for child in self.children():
                if isinstance(child, Metric):
                    child.reset()

    class _NoopSSIM(Metric):
        def __init__(self, data_range=1.0):
            super().__init__()

        def update(self, preds, target):
            pass

        def compute(self):
            return torch.tensor(float("nan"))

    tm.Metric = Metric
    tm_image = types.ModuleType("torchmetrics.image")
    tm_image.StructuralSimilarityIndexMeasure = _NoopSSIM
    tm.image = tm_image
    sys.modules["torchmetrics"] = tm
    sys.modules["torchmetrics.image"] = tm_image


@pytest.fixture(scope="module")
def ref():
    """Import the reference package (appended to sys.path so the repo's own
    top-level ``experiments`` package keeps precedence)."""
    _install_torchmetrics_stub()
    if REF not in sys.path:
        sys.path.append(REF)
    import p2igan_bench.models as models
    import p2igan_bench.modules.losses as losses

    torch.manual_seed(0)
    return types.SimpleNamespace(models=models, losses=losses)


def _sd_numpy(module: torch.nn.Module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _gauge_mask(h, w, n_points, seed=0):
    """One fixed spatial gauge pattern (the deterministic `stis` path)."""
    rng = np.random.default_rng(seed)
    flat = np.zeros((h * w,), np.float32)
    flat[rng.choice(h * w, n_points, replace=False)] = 1.0
    return flat.reshape(h, w)


def _inputs(b, t, h, w, n_points=79, seed=1):
    """Identical inputs in both layouts: torch (B,T,C,H,W), jax (B,T,H,W,C)."""
    rng = np.random.default_rng(seed)
    frames = rng.random((b, t, h, w, 1)).astype(np.float32)
    gauge = _gauge_mask(h, w, n_points)
    masks = np.broadcast_to(gauge[None, None, :, :, None], frames.shape)
    masks = np.ascontiguousarray(masks, np.float32)
    masked = frames * masks
    to_torch = lambda a: torch.from_numpy(np.transpose(a, (0, 1, 4, 2, 3)).copy())
    return (masked, masks), (to_torch(masked), to_torch(masks)), frames


# The reference InputBlock hard-codes AttentionBlock(16) (layer.py:310), so
# P2IGenerator only runs with sample_length == 16; dk/stdk/simple accept any T.
CFG_P2I = {"data": {"train": {"h": 32, "w": 32, "sample_length": 16, "mask": {}}}}
CFG32 = {"data": {"train": {"h": 32, "w": 32, "sample_length": 4, "mask": {}}}}


# ---------------------------------------------------------------------------
# The reference's idw_3d_knn oracle is only bit-meaningful away from k-NN
# ties: torch.cdist's quadratic expansion carries ~5e-4 absolute distance
# noise (zero self-distances come out as 4.9e-4; equidistant candidates get
# distinct values), so the reference's OWN selection at tie cells is
# arbitrary — it differs between its CPU and CUDA(amp fp16) runs. Measured
# against an exact float64 oracle, the executed reference deviates by up to
# 1.7e-2 at gauge-coincident cells and O(1) at tie cells (31% of cells for a
# frame-constant gauge mask). Parity is therefore asserted in three ways:
#   1. exact end-to-end: a 4-point single-frame mask forces k==n selection
#      (no ties possible) -> full chain matches the executed reference ~1e-6
#   2. op-level: cells with no k-boundary tie and not on a gauge match 1e-4
#   3. gauge (stis) end-to-end: statistical bounds vs the executed reference
# ---------------------------------------------------------------------------


def _forced_selection_inputs(b=2, t=16, h=32, w=32, seed=1):
    """Exactly 4 observed points, all in frame 0: with k=4 every grid cell
    selects all of them — the oracle has no tie freedom."""
    rng = np.random.default_rng(seed)
    frames = rng.random((b, t, h, w, 1)).astype(np.float32)
    masks = np.zeros((b, t, h, w, 1), np.float32)
    for (yy, xx) in [(5, 7), (12, 25), (20, 3), (28, 17)]:
        masks[:, 0, yy, xx, 0] = 1.0
    masked = frames * masks
    to_torch = lambda a: torch.from_numpy(np.transpose(a, (0, 1, 4, 2, 3)).copy())
    return (masked, masks), (to_torch(masked), to_torch(masks))


def test_p2igan_generator_forward_parity_exact(ref):
    """Full-chain exact parity (attention + IDW + conv decoder + importer)
    under forced k-NN selection."""
    from p2igan_tpu.models import P2IGenerator
    from p2igan_tpu.models import torch_import as TI

    torch.manual_seed(0)
    ref_gen = ref.models.P2IGenerator(CFG_P2I, num_res=1).eval()
    variables = TI.import_p2igan_generator(_sd_numpy(ref_gen), num_res=1)

    (masked, masks), (t_masked, t_masks) = _forced_selection_inputs()
    with torch.no_grad():
        want = ref_gen(t_masked, t_masks).numpy()  # (B,T,C,H,W)

    gen = P2IGenerator(H=32, W=32, length=16, num_res=1, base_channels=64,
                       idw_max_points=128, idw_chunk=16384)
    got = np.asarray(gen.apply(variables, jnp.asarray(masked), jnp.asarray(masks)))
    got = np.transpose(got, (0, 1, 4, 2, 3))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)

    # the folded serving variant (plain kernels + fused Convsin/repeat skip)
    # must match the same oracle
    gen_eval, folded = gen.fold_for_inference(variables)
    got_f = np.asarray(gen_eval.apply(folded, jnp.asarray(masked),
                                      jnp.asarray(masks)))
    got_f = np.transpose(got_f, (0, 1, 4, 2, 3))
    np.testing.assert_allclose(got_f, want, atol=2e-4, rtol=0)


def test_idw_op_parity_clean_cells(ref):
    """idw_3d_knn vs the executed reference: tight parity wherever the
    oracle is well-defined (no k-boundary tie within 1e-4, cell not on a
    gauge point where cdist self-distance noise dominates)."""
    import p2igan_bench.modules.layer as ref_layer
    from p2igan_tpu.ops.idw import extract_points, idw_3d_knn

    rng = np.random.default_rng(1)
    D, H, W = 16, 32, 32
    flat = np.zeros((H * W,), np.float32)
    flat[rng.choice(H * W, 79, replace=False)] = 1.0
    mask = np.broadcast_to(flat.reshape(1, H, W), (D, H, W)).astype(np.float32)
    vals_grid = rng.normal(size=(D, H, W)).astype(np.float32)

    tz, ty, tx = np.nonzero(mask > 0)
    pts = np.stack([tx / (W - 1), ty / (H - 1), tz / (D - 1)], -1).astype(np.float32)
    vals = vals_grid[tz, ty, tx]
    want = ref_layer.idw_3d_knn(torch.from_numpy(pts), torch.from_numpy(vals),
                                (D, H, W), k=4, rho=2.0, tau=0.05,
                                chunk=16384).numpy()

    p_j, v_j, valid = extract_points(jnp.asarray(mask), jnp.asarray(vals_grid), 1280)
    got = np.asarray(idw_3d_knn(p_j, v_j, valid, (D, H, W), k=4, rho=2.0,
                                tau=0.05, chunk=16384))

    # float64 oracle classifies cells
    gz, gy, gx = np.meshgrid(np.arange(D), np.arange(H), np.arange(W), indexing="ij")
    grid = np.stack([gx / (W - 1), gy / (H - 1), gz / (D - 1)], -1)
    grid = grid.reshape(-1, 3).astype(np.float64)
    d2 = ((grid[:, None, :] - pts.astype(np.float64)[None, :, :]) ** 2).sum(-1)
    ds = np.sqrt(np.sort(d2, axis=1))
    gap = (ds[:, 4] - ds[:, 3]).reshape(D, H, W)
    self_d = ds[:, 0].reshape(D, H, W)

    clean = (gap >= 1e-4) & (self_d >= 1e-3)
    assert clean.mean() > 0.5  # the comparison covers most of the grid
    diff = np.abs(got - want)
    assert diff[clean].max() < 1e-4, diff[clean].max()
    # gauge cells: bounded by the oracle's own cdist cancellation error
    assert diff[(gap >= 1e-4) & (self_d < 1e-3)].max() < 0.05


def test_p2igan_generator_gauge_statistical_parity(ref):
    """stis gauge path (incl. the flagship factored/shared-mask variant) vs
    the executed reference. Tie cells make bit parity ill-posed (see header);
    the bound here is the measured oracle-noise envelope: corr > 0.998,
    mean|diff| < 0.03 on outputs with rms ~0.57."""
    from p2igan_tpu.models import P2IGenerator
    from p2igan_tpu.models import torch_import as TI

    torch.manual_seed(1)
    ref_gen = ref.models.P2IGenerator(CFG_P2I, num_res=1).eval()
    variables = TI.import_p2igan_generator(_sd_numpy(ref_gen), num_res=1)

    (masked, masks), (t_masked, t_masks), _ = _inputs(2, 16, 32, 32, seed=5)
    with torch.no_grad():
        want = ref_gen(t_masked, t_masks).numpy()

    for factored in (False, True):
        gen = P2IGenerator(H=32, W=32, length=16, num_res=1, base_channels=64,
                           idw_max_points=1280, idw_chunk=16384,
                           idw_factored=factored, idw_shared_batch_mask=factored)
        got = np.asarray(gen.apply(variables, jnp.asarray(masked),
                                   jnp.asarray(masks)))
        got = np.transpose(got, (0, 1, 4, 2, 3))
        diff = np.abs(got - want)
        corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
        assert corr > 0.998, (factored, corr)
        assert diff.mean() < 0.03, (factored, diff.mean())


def test_p2igan_discriminator_forward_parity(ref):
    from p2igan_tpu.models import P2IDiscriminator
    from p2igan_tpu.models import torch_import as TI

    torch.manual_seed(2)
    ref_disc = ref.models.P2IDiscriminator(in_channels=16).eval()
    variables = TI.import_p2igan_discriminator(_sd_numpy(ref_disc))

    (_, _), (t_masked, _), frames = _inputs(2, 16, 32, 32, seed=7)
    t_frames = torch.from_numpy(np.transpose(frames, (0, 1, 4, 2, 3)).copy())
    with torch.no_grad():
        want = ref_disc(t_frames).numpy()

    disc = P2IDiscriminator(in_channels=16)
    got = np.asarray(disc.apply(variables, jnp.asarray(frames),
                                update_stats=False))
    # ours returns flattened (B, N); the reference fuses to (B, 1, H', W')
    # untrained spectral-norm logits are O(1e5); relative parity is the
    # meaningful criterion
    np.testing.assert_allclose(got, want.reshape(want.shape[0], -1),
                               atol=1e-2, rtol=2e-4)


def test_dk_generator_forward_parity(ref):
    from p2igan_tpu.models import DKGenerator
    from p2igan_tpu.models import torch_import as TI

    torch.manual_seed(3)
    ref_gen = ref.models.DKGenerator(CFG32, length=4).eval()
    variables = TI.import_dk_generator(_sd_numpy(ref_gen))

    (masked, masks), (t_masked, t_masks), _ = _inputs(2, 4, 32, 32, seed=9)
    with torch.no_grad():
        want = ref_gen(t_masked, t_masks).numpy()

    # the reference's visible gather uses torch's device-specific unsorted
    # top-k order; remap fc1 onto our ascending-index convention
    order = TI.visible_topk_order(masks[0, 0, :, :, 0].ravel(), k=79)
    variables = TI.remap_dk_visible_columns(variables, order, n_space=139)

    gen = DKGenerator(length=4)
    got = np.asarray(gen.apply(variables, jnp.asarray(masked), jnp.asarray(masks)))
    got = np.transpose(got, (0, 1, 4, 2, 3))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)


def test_stdk_generator_forward_parity(ref):
    from p2igan_tpu.models import STDKGenerator
    from p2igan_tpu.models import torch_import as TI

    torch.manual_seed(4)
    from p2igan_tpu.models.stdk import time_basis_count

    ref_gen = ref.models.STDKGenerator(CFG32, length=4).eval()
    variables = TI.import_stdk_generator(_sd_numpy(ref_gen))

    (masked, masks), (t_masked, t_masks), _ = _inputs(2, 4, 32, 32, seed=11)
    with torch.no_grad():
        want = ref_gen(t_masked, t_masks).numpy()

    order = TI.visible_topk_order(masks[0, 0, :, :, 0].ravel(), k=79)
    k_t = time_basis_count(4, (10, 19, 37, 73))
    variables = TI.remap_dk_visible_columns(variables, order, n_space=139,
                                            n_time=k_t, t_blocks=4)

    gen = STDKGenerator(length=4)
    got = np.asarray(gen.apply(variables, jnp.asarray(masked), jnp.asarray(masks)))
    got = np.transpose(got, (0, 1, 4, 2, 3))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)


def test_simple_generator_forward_parity(ref):
    from p2igan_tpu.models import SimpleGenerator
    from p2igan_tpu.models import torch_import as TI

    torch.manual_seed(5)
    ref_gen = ref.models.SimpleGenerator(in_channels=1, out_channels=1,
                                         base_channels=8).eval()
    variables = TI.import_simple_generator(_sd_numpy(ref_gen))

    (masked, masks), (t_masked, t_masks), _ = _inputs(2, 4, 32, 32, seed=13)
    with torch.no_grad():
        want = ref_gen(t_masked, t_masks).numpy()

    gen = SimpleGenerator(in_channels=1, out_channels=1, base_channels=8)
    got = np.asarray(gen.apply(variables, jnp.asarray(masked), jnp.asarray(masks),
                               train=False))
    got = np.transpose(got, (0, 1, 4, 2, 3))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)


def test_reconstruction_loss_parity(ref):
    from p2igan_tpu.losses import reconstruction_loss

    rng = np.random.default_rng(17)
    pred = rng.random((2, 4, 1, 16, 16)).astype(np.float32)
    true = rng.random((2, 4, 1, 16, 16)).astype(np.float32)

    ref_loss = ref.losses.ReconstructionLoss(k1_alpha=0.05)
    want, want_parts = ref_loss(torch.from_numpy(pred), torch.from_numpy(true))

    got, parts = reconstruction_loss(jnp.asarray(pred), jnp.asarray(true),
                                     k1_alpha=0.05)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(float(parts["pool"]), want_parts["pool"], rtol=1e-5)
    np.testing.assert_allclose(float(parts["reg"]), want_parts["reg"], rtol=1e-4)


@pytest.mark.parametrize("loss_type", ["hinge", "lsgan", "nsgan"])
@pytest.mark.parametrize("target_is_real,is_disc",
                         [(True, True), (False, True), (True, False)])
def test_gan_loss_parity(ref, loss_type, target_is_real, is_disc):
    from p2igan_tpu.losses import gan_loss

    rng = np.random.default_rng(19)
    raw = rng.normal(0, 1, (2, 1, 8, 8)).astype(np.float32)
    # nsgan applies BCELoss directly to D outputs -> needs (0, 1)
    logits = 1.0 / (1.0 + np.exp(-raw)) if loss_type == "nsgan" else raw

    want = ref.losses.gan_loss(torch.from_numpy(logits), target_is_real,
                               loss_type=loss_type, is_disc=is_disc)
    got = gan_loss(jnp.asarray(logits), target_is_real,
                   loss_type=loss_type, is_disc=is_disc)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-7)


def test_weighted_l1_and_shock_parity(ref):
    from p2igan_tpu.losses import shock_map, weighted_l1_distance

    rng = np.random.default_rng(23)
    pred = rng.random((2, 4, 1, 16, 16)).astype(np.float32)
    true = rng.random((2, 4, 1, 16, 16)).astype(np.float32)
    want = ref.losses.weighted_l1_distance(torch.from_numpy(pred),
                                           torch.from_numpy(true))
    got = weighted_l1_distance(jnp.asarray(pred), jnp.asarray(true))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    x = rng.random((2, 4, 16, 16)).astype(np.float32)
    want_sm = ref.losses.shock_map(torch.from_numpy(x), beta=0.02).numpy()
    got_sm = np.asarray(shock_map(jnp.asarray(x), beta=0.02))
    np.testing.assert_allclose(got_sm, want_sm, atol=1e-5, rtol=1e-4)


def test_online_metric_suite_parity(ref):
    """The ONLINE metric suite vs the reference's EXECUTED metrics/metric.py
    (RainfallMetricSuite under the functional torchmetrics stub): identical
    MAE/RMSE, per-threshold POD/FAR/CSI/HSS, and per-(threshold, scale) FSS
    across multi-batch accumulation and after a reset round. The ssim key is
    excluded (the stub's SSIM is a no-op — see _install_torchmetrics_stub);
    our SSIM is validated against a numpy gaussian reference in
    tests/test_metrics.py. Ref: metric.py:28-239."""
    import p2igan_bench.metrics.metric as ref_metric

    from p2igan_tpu.metrics.metric import MetricConfig, RainfallMetricSuite

    rng = np.random.default_rng(3)
    ref_suite = ref_metric.RainfallMetricSuite(ref_metric.MetricConfig())
    ours = RainfallMetricSuite(MetricConfig())

    def one_round(n_updates):
        for _ in range(n_updates):
            p = rng.random((2, 3, 1, 12, 12)).astype(np.float32)  # [B,T,C,H,W]
            t = (rng.random((2, 3, 1, 12, 12)) ** 2).astype(np.float32)
            ref_suite.update(torch.from_numpy(p), torch.from_numpy(t))
            ours.update(jnp.asarray(np.transpose(p, (0, 1, 3, 4, 2))),
                        jnp.asarray(np.transpose(t, (0, 1, 3, 4, 2))))
        want = ref_suite.compute()
        got = ours.compute()
        compared = 0
        for key, val in want.items():
            if key == "ssim":
                continue
            assert key in got, f"missing metric key {key}"
            np.testing.assert_allclose(got[key], val, rtol=2e-4, atol=1e-6,
                                       err_msg=key)
            compared += 1
        assert compared >= 2 + 4 * 4 + 4 * 4  # mae/rmse + cat + fss

    one_round(3)
    ref_suite.reset()
    ours.reset()
    one_round(2)  # reset semantics match: fresh accumulation, same values
