

import numpy as np
import pytest

from p2igan_tpu.data import fake
from p2igan_tpu.training.trainer import Trainer


def _cfg(root, model="simple", use_gan=0, base=8, t=4, hw=32):
    return {
        "seed": 7,
        "save_dir": str(root / "weights"),
        "experiment_name": "test-exp",
        "run_name": "test-run",
        "model": {"name": model, "in_channels": 1, "out_channels": 1,
                  "base_channels": base},
        "data": {
            "train": {"data_root": str(root / "train.zarr"), "w": hw, "h": hw,
                      "sample_length": t,
                      "mask": {"type": "sti", "block_sizes": [8]}},
        },
        "loss": {"adversarial_weight": 0.01, "k1_weight": 0.05, "temp_weight": 0,
                 "gan_loss": "hinge", "use_gan": use_gan},
        "train": {"optimizer": {"type": "Adam", "beta1": 0.0, "beta2": 0.99,
                                "lr": 1e-4},
                  "batch_size": 2, "num_workers": 2, "log_step": 2,
                  "iterations": 3, "use_validation": True, "use_test": False},
    }


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("traindata")
    fake.write_train_zarr(root / "train.zarr", n_events=2, T=8, H=32, W=32,
                          window=4, stride=2, seed=0)
    return root


@pytest.mark.slow
def test_simple_training_runs(data_root, monkeypatch):
    monkeypatch.setenv("P2IGAN_FORCE_FILE_TRACKER", "1")
    cfg = _cfg(data_root, model="simple", use_gan=0)
    tr = Trainer(cfg)
    tr.train()
    assert tr.global_step >= 3
    assert (data_root / "weights" / "latest.ckpt").exists()
    assert (data_root / "weights" / "best.ckpt").exists()


def test_simple_gan_training_and_resume(data_root, monkeypatch):
    monkeypatch.setenv("P2IGAN_FORCE_FILE_TRACKER", "1")
    cfg = _cfg(data_root, model="simple", use_gan=1)
    cfg["save_dir"] = str(data_root / "weights_gan")
    cfg["train"]["iterations"] = 2
    tr = Trainer(cfg)
    tr.train()
    p0 = np.asarray(
        next(iter(tr.state.gen_params.values()))["kernel"]
        if "kernel" in next(iter(tr.state.gen_params.values()))
        else tr.state.gen_params["enc0"]["kernel"])

    # resume restores step counter and params
    tr2 = Trainer(cfg)
    tr2.load(str(data_root / "weights_gan" / "latest.ckpt"))
    assert tr2.global_step == tr.global_step
    # resume must restore the best-val watermark (so a worse first epoch
    # can't overwrite best.ckpt) and keep TrainState.step in sync
    assert tr2.best_val == tr.best_val
    assert int(tr2.state.step) == tr2.global_step
    p1 = np.asarray(tr2.state.gen_params["enc0"]["kernel"])
    np.testing.assert_array_equal(np.asarray(tr.state.gen_params["enc0"]["kernel"]), p1)


@pytest.mark.slow
def test_single_forward_step_equivalence():
    """The jax.vjp single-forward GAN step must match the two-forward step.

    For non-Simple generators both train-mode flags hit the same forward, so
    losses, updated params, and spectral state must agree to float tolerance.
    """
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.models import P2IDiscriminator, P2IGenerator
    from p2igan_tpu.training.steps import TrainState, build_train_step, make_optimizer

    t, hw, base = 4, 16, 16
    gen = P2IGenerator(H=hw, W=hw, length=t, num_res=1, base_channels=base,
                       idw_max_points=64, idw_chunk=256)
    disc = P2IDiscriminator(in_channels=t)

    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.random((2, t, hw, hw, 1)).astype(np.float32))
    masks = jnp.asarray((rng.random((2, t, hw, hw, 1)) < 0.2).astype(np.float32))
    masked = frames * masks

    gen_vars = dict(gen.init(jax.random.key(0), masked, masks))
    disc_vars = dict(disc.init(jax.random.key(1), frames))
    opt_g, opt_d = make_optimizer({"lr": 1e-3}), make_optimizer({"lr": 1e-3})
    gp, dp = gen_vars.pop("params"), disc_vars.pop("params")

    def fresh_state():
        return TrainState(step=jnp.zeros((), jnp.int32),
                          gen_params=gp, gen_extra=gen_vars, opt_g=opt_g.init(gp),
                          disc_params=dp, disc_extra=disc_vars,
                          opt_d=opt_d.init(dp))

    kw = dict(use_gan=True, gan_loss_type="hinge", adversarial_weight=0.01,
              k1_alpha=0.05, donate=False)
    step1 = build_train_step(gen, disc, opt_g, opt_d, single_forward=True, **kw)
    step2 = build_train_step(gen, disc, opt_g, opt_d, single_forward=False, **kw)

    s1, s2 = fresh_state(), fresh_state()
    for _ in range(2):
        s1, m1 = step1(s1, frames, masked, masks)
        s2, m2 = step2(s2, frames, masked, masks)
    for k in ("loss", "rec_loss", "adv_loss", "dis_loss"):
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-3, atol=1e-5),
        s1.gen_params, s2.gen_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-3, atol=1e-5),
        s1.disc_params, s2.disc_params)


@pytest.mark.slow
@pytest.mark.parametrize("family", ["p2igan", "dk"])
def test_overfit_one_batch_reduces_loss(family):
    """Optimization LEARNS (VERDICT r4 item 4a): repeated steps on one fixed
    small batch must drive the weighted-L1 rec loss well below its initial
    value. Parity tests pin per-step arithmetic against the reference but
    would pass with a sign-flipped update; this catches exactly that class.
    Calibrated on CPU: p2igan 5.64 -> 1.25 in 150 steps, dk 3.99 -> 1.25 in
    200 (plateau ~1.25 is the capacity floor for a noise target at this
    size) — thresholds carry ~30% margin."""
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.models import DKGenerator, P2IGenerator
    from p2igan_tpu.training.steps import (TrainState, build_train_step,
                                           make_optimizer)

    t, hw = 4, 16
    rng = np.random.default_rng(3)
    masks_np = (rng.random((2, t, hw, hw, 1)) < 0.2).astype(np.float32)
    masks_np[:, :, 0, :2] = 1.0  # >= visible_k observed pixels for dk
    frames = jnp.asarray(rng.random((2, t, hw, hw, 1)).astype(np.float32))
    masks = jnp.asarray(masks_np)
    masked = frames * masks

    if family == "p2igan":
        gen = P2IGenerator(H=hw, W=hw, length=t, num_res=1, base_channels=16,
                           idw_max_points=64, idw_chunk=256)
        nsteps = 150
    else:
        gen = DKGenerator(length=t, visible_k=7, num_basis_space=(4, 6))
        nsteps = 200
    gv = dict(gen.init(jax.random.key(0), masked, masks))
    opt = make_optimizer({"lr": 1e-3})
    gp = gv.pop("params")
    state = TrainState(step=jnp.zeros((), jnp.int32), gen_params=gp,
                       gen_extra=gv, opt_g=opt.init(gp))
    step = build_train_step(gen, None, opt, None, use_gan=False,
                            k1_alpha=0.0, donate=False)
    state, m = step(state, frames, masked, masks)
    initial = float(m["rec_loss"])
    best = initial
    for _ in range(nsteps - 1):
        state, m = step(state, frames, masked, masks)
        best = min(best, float(m["rec_loss"]))
    assert initial > 3.0, f"unexpectedly easy start: {initial}"
    assert best < 0.45 * initial, (initial, best)
    assert best < 1.6, (initial, best)


@pytest.mark.slow
def test_fused_disc_forward_equivalence():
    """Concatenated fake+real D forward == two separate forwards.

    With spectral power-iteration updates OFF the discriminator is a pure
    function, so conv on the stacked batch must equal the stacked conv
    outputs up to conv-tiling ulp noise (untrained SN logits are O(1e7):
    fresh independent u/v give a near-zero sigma that blows the normalized
    weights up, and XLA tiles batch 4 differently from batch 2, flipping
    last bits — rtol 2e-4 admits that ulp noise at this conditioning). This
    validates the fused D-step restructure; the only intended semantic
    change of fusion is power-iteration cadence, exercised by the drift
    check below.
    """
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.models import P2IDiscriminator
    from p2igan_tpu.training.steps import TrainState, build_train_step, make_optimizer

    t, hw = 4, 16
    disc = P2IDiscriminator(in_channels=t)
    rng = np.random.default_rng(5)
    fake = jnp.asarray(rng.random((2, t, hw, hw, 1)).astype(np.float32))
    real = jnp.asarray(rng.random((2, t, hw, hw, 1)).astype(np.float32))
    variables = dict(disc.init(jax.random.key(0), real))

    both = disc.apply(variables, jnp.concatenate([fake, real], 0),
                      update_stats=False)
    lf = disc.apply(variables, fake, update_stats=False)
    lr = disc.apply(variables, real, update_stats=False)
    np.testing.assert_allclose(np.asarray(both[:2]), np.asarray(lf), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(both[2:]), np.asarray(lr), rtol=2e-4)

    # short-run drift check: the fused step (one power iteration per D step)
    # must track the reference-cadence step (two) closely over a few steps
    from p2igan_tpu.models import P2IGenerator

    gen = P2IGenerator(H=hw, W=hw, length=t, num_res=1, base_channels=16,
                       idw_max_points=64, idw_chunk=256)
    masks = jnp.asarray((rng.random((2, t, hw, hw, 1)) < 0.2).astype(np.float32))
    masked = real * masks
    gen_vars = dict(gen.init(jax.random.key(1), masked, masks))
    opt_g, opt_d = make_optimizer({"lr": 1e-3}), make_optimizer({"lr": 1e-3})
    gp, dp = gen_vars.pop("params"), dict(variables).pop("params")
    # converge the power iteration first: from a random u, one-vs-two
    # iterations per step legitimately produce very different sigma
    # estimates; the cadence claim ("trails by at most one step") only
    # holds near the fixed point, which is where real training lives
    warm = jax.jit(lambda v: disc.apply(v, real, update_stats=True,
                                        mutable=["spectral"])[1])
    for _ in range(50):
        variables = {"params": variables["params"], **dict(warm(variables))}
    disc_extra = {k: v for k, v in variables.items() if k != "params"}

    def fresh_state():
        return TrainState(step=jnp.zeros((), jnp.int32),
                          gen_params=gp, gen_extra=gen_vars, opt_g=opt_g.init(gp),
                          disc_params=dp, disc_extra=disc_extra,
                          opt_d=opt_d.init(dp))

    kw = dict(use_gan=True, gan_loss_type="hinge", adversarial_weight=0.01,
              k1_alpha=0.05, donate=False)
    fused = build_train_step(gen, disc, opt_g, opt_d, fused_disc_forward=True, **kw)
    exact = build_train_step(gen, disc, opt_g, opt_d, fused_disc_forward=False, **kw)
    s1, s2 = fresh_state(), fresh_state()
    for _ in range(3):
        s1, m1 = fused(s1, real, masked, masks)
        s2, m2 = exact(s2, real, masked, masks)
    for k in ("loss", "rec_loss", "dis_loss"):
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=5e-2, atol=5e-3, err_msg=k)


@pytest.mark.slow
def test_p2igan_gan_step(data_root, monkeypatch):
    monkeypatch.setenv("P2IGAN_FORCE_FILE_TRACKER", "1")
    cfg = _cfg(data_root, model="p2igan", use_gan=1, base=16, t=4, hw=32)
    cfg["save_dir"] = str(data_root / "weights_p2i")
    cfg["train"]["iterations"] = 1
    tr = Trainer(cfg)
    tr.train()
    assert tr.global_step == 1
    # spectral state advanced during training
    u = np.asarray(tr.state.disc_extra["spectral"]["d2d_0"]["u"])
    assert np.isfinite(u).all()


@pytest.mark.slow
def test_device_decode_pipeline_matches_host(data_root, monkeypatch):
    """data.train.device_decode=1 ships uint8 (video, mask) pairs and decodes
    on device; losses must match the host float pipeline exactly (same IEEE
    ops, same per-item RNG)."""
    monkeypatch.setenv("P2IGAN_FORCE_FILE_TRACKER", "1")

    losses = {}
    for decode in (0, 1):
        cfg = _cfg(data_root, model="simple", use_gan=0)
        cfg["save_dir"] = str(data_root / f"weights_dd{decode}")
        cfg["train"]["iterations"] = 2
        if decode:
            cfg["data"]["train"]["device_decode"] = 1
        tr = Trainer(cfg)
        tr.train()
        losses[decode] = tr.last_rec_loss
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)


def test_window_length_mismatch_fails_fast(tmp_path, monkeypatch):
    """p2igan with sample_length != the train zarr's window length must raise
    a named config error instead of a deep flax shape error."""
    monkeypatch.setenv("P2IGAN_FORCE_FILE_TRACKER", "1")
    fake.write_train_zarr(tmp_path / "train.zarr", n_events=1, T=12, H=32,
                          W=32, window=6, stride=3, seed=0)
    cfg = _cfg(tmp_path, model="p2igan", use_gan=0, base=16, t=4, hw=32)
    with pytest.raises(ValueError, match="window"):
        Trainer(cfg)


@pytest.mark.slow
@pytest.mark.parametrize("model", ["dk", "stdk"])
def test_dk_family_training_runs(data_root, monkeypatch, model, tmp_path):
    """The DeepKriging baselines must train end-to-end through the Trainer
    (reference dk.json / stdk.json: plain reconstruction, use_gan=false);
    previously only forward parity and checkpoint import were covered."""
    monkeypatch.setenv("P2IGAN_FORCE_FILE_TRACKER", "1")
    cfg = _cfg(data_root, model=model, use_gan=0)
    cfg["save_dir"] = str(tmp_path / "weights")
    cfg["train"]["iterations"] = 2
    cfg["train"]["use_validation"] = False
    tr = Trainer(cfg)
    tr.train()
    assert tr.global_step >= 2
    assert (tmp_path / "weights" / "latest.ckpt").exists()


def test_device_prefetch_releases_worker_on_early_break():
    """Breaking out of the epoch loop (max_steps mid-epoch) must not leave
    the prefetch worker blocked on a full queue holding device batches."""
    import threading
    import time

    from p2igan_tpu.training.trainer import Trainer

    class _Host:
        _put_batch = staticmethod(lambda batch: batch)

    loader = [np.zeros(2) for _ in range(32)]
    before = {t.ident for t in threading.enumerate()}
    gen = Trainer._device_prefetch(_Host(), loader, lookahead=2)
    next(gen)
    gen.close()  # == `break` in the consuming for-loop
    deadline = time.time() + 5.0
    while time.time() < deadline:
        extra = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"prefetch worker still alive: {extra}"


@pytest.mark.slow
def test_resume_continues_epoch_stream(data_root, monkeypatch, tmp_path):
    """Resume restores the epoch counter and the loader's shuffle/mask RNG
    stream (epoch-derived), and a run resumed exactly at max_steps trains
    ZERO further steps instead of one past the budget."""
    monkeypatch.setenv("P2IGAN_FORCE_FILE_TRACKER", "1")
    cfg = _cfg(data_root, model="simple", use_gan=0)
    cfg["save_dir"] = str(tmp_path / "weights")
    cfg["train"]["iterations"] = 2
    cfg["train"]["use_validation"] = False
    tr = Trainer(cfg)
    tr.train()
    assert tr.global_step == 2

    tr2 = Trainer(cfg)
    tr2.load(str(tmp_path / "weights" / "latest.ckpt"))
    assert tr2.start_epoch >= 1
    p_before = np.asarray(tr2.state.gen_params["enc0"]["kernel"])
    tr2.train()  # already at max_steps: must be a no-op for params
    assert tr2.global_step == 2
    np.testing.assert_array_equal(
        p_before, np.asarray(tr2.state.gen_params["enc0"]["kernel"]))


def test_resume_migrates_pre_nomu_checkpoint(data_root, monkeypatch, tmp_path):
    """Checkpoints written before the mu-free Adam fast path stored optax's
    full ScaleByAdamState(count, mu, nu); load must still resume (ADVICE r4).
    At b1==0 mu is identically the last gradient — no information — so the
    migration shim drops it before from_state_dict."""
    monkeypatch.setenv("P2IGAN_FORCE_FILE_TRACKER", "1")
    cfg = _cfg(data_root, model="simple", use_gan=1)
    cfg["save_dir"] = str(tmp_path / "weights_mu")
    cfg["train"]["iterations"] = 2
    tr = Trainer(cfg)
    tr.train()

    # Rewrite latest.ckpt into the pre-round-4 on-disk shape: the inner Adam
    # state regains a 'mu' buffer (zeros — its value is never consumed).
    from p2igan_tpu.training.checkpoint import (load_checkpoint_raw,
                                                save_checkpoint)
    raw = load_checkpoint_raw(tmp_path / "weights_mu" / "latest.ckpt")
    for key in ("optimizer_g", "optimizer_d"):
        inner = raw[key]["0"]
        assert set(inner) == {"count", "nu"}, f"unexpected {key} layout"
        import jax
        inner["mu"] = jax.tree.map(np.zeros_like, inner["nu"])
    save_checkpoint(tmp_path / "weights_mu" / "old.ckpt", raw)

    tr2 = Trainer(cfg)
    tr2.load(str(tmp_path / "weights_mu" / "old.ckpt"))
    # migrated state matches the modern checkpoint exactly
    import jax
    for a, b in zip(jax.tree.leaves(tr.state.opt_g),
                    jax.tree.leaves(tr2.state.opt_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(tr.state.gen_params["enc0"]["kernel"]),
        np.asarray(tr2.state.gen_params["enc0"]["kernel"]))


def test_resume_rejects_torch_checkpoint(data_root, monkeypatch, tmp_path):
    monkeypatch.setenv("P2IGAN_FORCE_FILE_TRACKER", "1")
    cfg = _cfg(data_root, model="simple", use_gan=0)
    cfg["save_dir"] = str(tmp_path / "weights")
    tr = Trainer(cfg)
    with pytest.raises(ValueError, match="torch checkpoint"):
        tr.load(tmp_path / "weights.pt")


def test_idw_hoisted_step_matches_inline():
    """build_train_step(idw_prepared=...) == the in-step gauge selection.

    stis configs share ONE fixed gauge mask across the run, so the factored
    IDW's gauge top-k can be computed once and baked into the compiled step
    (trainer._maybe_hoist_idw, VERDICT r2 item 3). The selection depends only
    on the mask — a constant w.r.t. the vjp over generator params — so the
    hoisted step must reproduce the inline step's metrics and updates.

    Gauge layout is TIE-FREE BY CONSTRUCTION: selection bits legitimately
    differ between compilation contexts at exact-distance ties (FMA-level
    ULP flips pick a different equidistant candidate — the documented tie
    boundary, ops/idw.py factored_prepare_full). At k=4 ties are structural
    (same gauge, temporally symmetric frames give exactly equal dz^2), so
    the test runs idw_k=2 with a searched layout (seed 2233, 4 gauges on
    16x16, D=4) where both the spatial cut's and the combine stage's
    rank-(k-1)/k candidate metrics 9*s + 225*dz^2 are distinct INTEGERS for
    every pixel and output frame — a 1-ULP perturbation cannot flip any
    selection."""
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.models import P2IDiscriminator, P2IGenerator
    from p2igan_tpu.training.steps import (TrainState, build_eval_step,
                                           build_train_step, make_optimizer)

    t, hw, base = 4, 16, 16
    gen = P2IGenerator(H=hw, W=hw, length=t, num_res=1, base_channels=base,
                       idw_max_points=512, idw_chunk=256, idw_factored=True,
                       idw_shared_batch_mask=True, idw_k=2)
    disc = P2IDiscriminator(in_channels=t)

    rng = np.random.default_rng(11)
    mask_xy = np.zeros((hw, hw), np.float32)
    flat = np.random.default_rng(2233).choice(hw * hw, size=4, replace=False)
    mask_xy.reshape(-1)[flat] = 1.0
    masks = jnp.asarray(np.broadcast_to(mask_xy[None, None, :, :, None],
                                        (2, t, hw, hw, 1)).copy())
    frames = jnp.asarray(rng.random((2, t, hw, hw, 1)).astype(np.float32))
    masked = frames * masks

    gen_vars = dict(gen.init(jax.random.key(0), masked, masks))
    disc_vars = dict(disc.init(jax.random.key(1), frames))
    opt_g, opt_d = make_optimizer({"lr": 1e-3}), make_optimizer({"lr": 1e-3})
    gp, dp = gen_vars.pop("params"), disc_vars.pop("params")

    def fresh_state():
        return TrainState(step=jnp.zeros((), jnp.int32),
                          gen_params=gp, gen_extra=gen_vars,
                          opt_g=opt_g.init(gp), disc_params=dp,
                          disc_extra=disc_vars, opt_d=opt_d.init(dp))

    prep = gen.prepare_idw(jnp.asarray(mask_xy))
    kw = dict(use_gan=True, gan_loss_type="hinge", adversarial_weight=0.01,
              k1_alpha=0.05, donate=False)
    step_inline = build_train_step(gen, disc, opt_g, opt_d, **kw)
    step_hoist = build_train_step(gen, disc, opt_g, opt_d,
                                  idw_prepared=prep, **kw)

    s1, s2 = fresh_state(), fresh_state()
    for _ in range(2):
        s1, m1 = step_inline(s1, frames, masked, masks)
        s2, m2 = step_hoist(s2, frames, masked, masks)
    for k in ("loss", "rec_loss", "adv_loss", "dis_loss"):
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    # Param tolerance: the two steps are DIFFERENT compiled programs, so
    # fusion-level FMA noise in the grads is amplified by Adam's
    # sqrt-second-moment normalization over 2 steps (observed: single
    # isolated elements drifting ~2e-6 with identical selections, while the
    # per-step metrics above agree at rtol 1e-5). A selection flip would
    # instead shift MANY elements by ~lr (1e-3) — atol 5e-5 separates the
    # two regimes cleanly.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-3, atol=5e-5),
        s1.gen_params, s2.gen_params)

    ev_inline = build_eval_step(gen, k1_alpha=0.05)
    ev_hoist = build_eval_step(gen, k1_alpha=0.05, idw_prepared=prep)
    np.testing.assert_allclose(np.asarray(ev_inline(s1, frames, masked, masks)),
                               np.asarray(ev_hoist(s1, frames, masked, masks)),
                               rtol=1e-6)


def test_trainer_hoists_stis_gauge_selection(tmp_path, monkeypatch):
    """A p2igan + stis training run must hoist the gauge selection once from
    the first batch's concrete mask and still train to a finite loss."""
    monkeypatch.setenv("P2IGAN_FORCE_FILE_TRACKER", "1")
    fake.write_train_zarr(tmp_path / "train.zarr", n_events=2, T=8, H=32,
                          W=32, window=4, stride=2, seed=0)
    mask_file = fake.write_gauge_mask(tmp_path / "gauge.txt", H=32, W=32,
                                      n_gauges=13, seed=3)
    cfg = _cfg(tmp_path, model="p2igan", use_gan=0, base=16, t=4, hw=32)
    cfg["data"]["train"]["mask"] = {"type": "stis", "file": str(mask_file)}
    cfg["train"]["iterations"] = 1
    cfg["train"]["use_validation"] = False
    tr = Trainer(cfg)
    assert tr._idw_hoist_pending
    inline_step = tr.train_step
    tr.train()
    assert not tr._idw_hoist_pending
    assert tr.train_step is not inline_step  # steps were rebuilt hoisted
    assert tr.global_step == 1
    assert np.isfinite(tr.last_rec_loss)


def test_adam_nomu_matches_optax():
    """make_optimizer's mu-free beta1=0 fast path must be BIT-identical to
    stock optax.adam(b1=0) — same updates, same params over several steps —
    while carrying no mu buffer in its state (the param-sized saving is the
    point; PROFILE.md round-4 opt_g roofline)."""
    import jax
    import jax.numpy as jnp
    import optax

    from p2igan_tpu.training.steps import make_optimizer

    rng = np.random.default_rng(7)
    params = {
        "w": jnp.asarray(rng.standard_normal((33, 65)).astype(np.float32)),
        "b": jnp.asarray(rng.standard_normal((65,)).astype(np.float32)),
        "scalar": jnp.float32(0.3),
    }
    fast = make_optimizer({"lr": 1e-3, "beta1": 0.0, "beta2": 0.99})
    ref = optax.adam(learning_rate=1e-3, b1=0.0, b2=0.99)

    # no param-sized mu leaf: fast state must hold exactly ONE param-sized
    # tree (nu) vs optax.adam's two (mu + nu)
    n_param_leaves = len(jax.tree.leaves(params))
    fast_leaves = jax.tree.leaves(fast.init(params))
    ref_leaves = jax.tree.leaves(ref.init(params))
    assert len(fast_leaves) == len(ref_leaves) - n_param_leaves

    sf, sr = fast.init(params), ref.init(params)
    pf, pr = params, params
    for step in range(4):
        g = jax.tree.map(
            lambda p: jnp.asarray(
                rng.standard_normal(p.shape).astype(np.float32)), pf)
        uf, sf = fast.update(g, sf, pf)
        ur, sr = ref.update(g, sr, pr)
        pf = optax.apply_updates(pf, uf)
        pr = optax.apply_updates(pr, ur)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), uf, ur)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), pf, pr)

    # nonzero beta1 must fall back to stock adam (mu present again)
    full = make_optimizer({"lr": 1e-3, "beta1": 0.5, "beta2": 0.99})
    assert len(jax.tree.leaves(full.init(params))) == len(ref_leaves)
