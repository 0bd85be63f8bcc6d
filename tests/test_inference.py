import numpy as np
import pytest

from p2igan_tpu.data import fake, zarrlite
from p2igan_tpu.inference.driver import SlidingWindowReconstructor, run_inference
from p2igan_tpu.models import SimpleGenerator
import jax


@pytest.fixture(scope="module")
def gen_and_vars():
    gen = SimpleGenerator(base_channels=4)
    masked = np.zeros((1, 4, 16, 16, 1), np.float32)
    vars_ = gen.init(jax.random.key(0), masked, masked)
    return gen, vars_


def _naive_reconstruct(gen, vars_, masked, masks, stride, overlap, scale):
    """Python replica of the reference window loop (infer.py:217-245)."""
    T, H, W, C = masked.shape
    step = max(1, stride - overlap)
    accum = np.zeros((T, H, W, C), np.float32)
    weight = np.zeros((T, 1, 1, 1), np.float32)
    for start in range(0, T, step):
        end = start + stride
        if end > T:
            pad_len = end - T
            wm = np.concatenate([masked[start:], np.repeat(masked[-1:], pad_len, 0)], 0)
            wk = np.concatenate([masks[start:], np.repeat(masks[-1:], pad_len, 0)], 0)
            valid = T - start
        else:
            wm, wk = masked[start:end], masks[start:end]
            valid = stride
        preds = np.asarray(gen.apply(vars_, wm[None], wk[None]))[0]
        for i in range(valid):
            accum[start + i] += preds[i]
            weight[start + i] += 1.0
    comp = accum / np.maximum(weight, 1e-5)
    return np.clip(comp * scale, 0.0, None)


@pytest.mark.parametrize("T", [11, 16, 23])
def test_batched_windows_match_naive_loop(rng, gen_and_vars, T):
    gen, vars_ = gen_and_vars
    stride, overlap, scale = 8, 4, 255.0
    masked = rng.random((T, 16, 16, 1)).astype(np.float32)
    masks = (rng.random((T, 16, 16, 1)) < 0.3).astype(np.float32)
    ref = _naive_reconstruct(gen, vars_, masked, masks, stride, overlap, scale)
    recon = SlidingWindowReconstructor(gen, vars_, stride=stride, overlap=overlap,
                                       window_batch=2, output_scale=scale,
                                       t_bucket=8)
    out = recon(masked, masks)
    np.testing.assert_allclose(ref, out, atol=2e-3, rtol=1e-4)


def test_run_inference_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("P2IGAN_FORCE_FILE_TRACKER", "1")
    fake.write_h5_events(tmp_path / "events", n_events=2, T=10, H=32, W=32)
    mask_file = fake.write_gauge_mask(tmp_path / "mask.txt", H=32, W=32, n_gauges=20)

    cfg = {
        "seed": 1,
        "save_dir": str(tmp_path / "weights"),
        "model": {"name": "simple", "in_channels": 1, "base_channels": 4},
        "data": {
            "train": {"data_root": str(tmp_path / "events"), "w": 32, "h": 32,
                      "sample_length": 4,
                      "mask": {"type": "stis", "file": str(mask_file)}},
            "test": {"data_root": str(tmp_path / "events"), "w": 32, "h": 32,
                     "sample_length": None},
        },
        "loss": {"use_gan": 0, "k1_weight": 0.0},
        "train": {"optimizer": {"lr": 1e-4}, "batch_size": 1, "num_workers": 1,
                  "iterations": 1, "log_step": 1, "use_validation": False},
    }
    # train one step to produce latest.ckpt
    from p2igan_tpu.training.trainer import Trainer

    tr = Trainer(cfg)
    tr.train()

    out = run_inference(cfg, stride=4, overlap=2, passes=2, overwrite=True)
    g = zarrlite.open(out, mode="r")
    assert g.attrs["model_name"] == "simple"
    assert g.attrs["passes"] == 2
    keys = g.array_keys()
    assert keys == ["event_01", "event_02"]
    ev = g["event_01"][:]
    assert ev.shape == (10, 32, 32, 1)
    assert ev.min() >= 0.0
    assert np.isfinite(ev).all()

    # data.test.shuffle must be ignored during inference: event_%02d keys and
    # the pass>1 running mean are positional, so a shuffled loader would
    # misattribute events. Forced-off shuffle => identical outputs.
    cfg["data"]["test"]["shuffle"] = True
    out2 = run_inference(cfg, stride=4, overlap=2, passes=2,
                         output=str(tmp_path / "shuffled.zarr"), overwrite=True)
    g2 = zarrlite.open(out2, mode="r")
    for key in keys:
        np.testing.assert_array_equal(g[key][:], g2[key][:])


def test_run_inference_batched_events_matches_sequential(tmp_path, monkeypatch):
    """batch_events>1 groups equal-bucket events through recon.batch; outputs
    must match the sequential driver."""
    monkeypatch.setenv("P2IGAN_FORCE_FILE_TRACKER", "1")
    fake.write_h5_events(tmp_path / "events", n_events=3, T=10, H=32, W=32)
    mask_file = fake.write_gauge_mask(tmp_path / "mask.txt", H=32, W=32, n_gauges=20)

    cfg = {
        "seed": 1,
        "save_dir": str(tmp_path / "weights"),
        "model": {"name": "simple", "in_channels": 1, "base_channels": 4},
        "data": {
            "train": {"data_root": str(tmp_path / "events"), "w": 32, "h": 32,
                      "sample_length": 4,
                      "mask": {"type": "stis", "file": str(mask_file)}},
            "test": {"data_root": str(tmp_path / "events"), "w": 32, "h": 32,
                     "sample_length": None},
        },
        "loss": {"use_gan": 0, "k1_weight": 0.0},
        "train": {"optimizer": {"lr": 1e-4}, "batch_size": 1, "num_workers": 1,
                  "iterations": 1, "log_step": 1, "use_validation": False},
    }
    from p2igan_tpu.training.trainer import Trainer

    Trainer(cfg).train()

    seq = run_inference(cfg, stride=4, overlap=2, overwrite=True,
                        output=str(tmp_path / "seq.zarr"))
    bat = run_inference(cfg, stride=4, overlap=2, overwrite=True,
                        batch_events=2, output=str(tmp_path / "bat.zarr"))
    gs, gb = zarrlite.open(seq, mode="r"), zarrlite.open(bat, mode="r")
    assert gs.array_keys() == gb.array_keys() == ["event_01", "event_02",
                                                  "event_03"]
    for k in gs.array_keys():
        np.testing.assert_allclose(gs[k][:], gb[k][:], atol=1e-5)


@pytest.mark.slow
def test_flattened_batch_program_matches_sequential():
    """The flattened multi-event program (shared gauge mask, hoisted prep)
    and the vmap fallback (distinct masks) both match per-event calls."""
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.inference.driver import SlidingWindowReconstructor
    from p2igan_tpu.models import P2IGenerator

    rng = np.random.default_rng(7)
    hw, t, ev_t = 16, 4, 8
    gen = P2IGenerator(H=hw, W=hw, length=t, num_res=1, base_channels=16,
                       idw_max_points=128, idw_chunk=256,
                       idw_factored=True, idw_shared_batch_mask=True)
    flat = np.zeros((hw * hw,), np.float32)
    flat[rng.choice(hw * hw, 11, replace=False)] = 1.0
    shared = np.broadcast_to(flat.reshape(1, 1, hw, hw, 1),
                             (3, ev_t, hw, hw, 1)).astype(np.float32)
    frames = rng.random((3, ev_t, hw, hw, 1)).astype(np.float32)
    masked = frames * shared
    variables = gen.init(jax.random.key(0), jnp.asarray(masked[:, :t]),
                         jnp.asarray(shared[:, :t]))

    recon = SlidingWindowReconstructor(gen, variables, stride=t, overlap=1,
                                       window_batch=2, t_bucket=ev_t)
    seq = np.stack([recon(masked[e], shared[e]) for e in range(3)])
    got = recon.batch(masked, shared)
    np.testing.assert_allclose(got, seq, atol=1e-5)

    # distinct per-event masks -> vmap fallback path
    masks2 = np.zeros_like(shared).copy()
    for e in range(3):
        f = np.zeros((hw * hw,), np.float32)
        f[np.random.default_rng(e).choice(hw * hw, 9, replace=False)] = 1.0
        masks2[e] = np.broadcast_to(f.reshape(1, hw, hw, 1), (ev_t, hw, hw, 1))
    masked2 = frames * masks2
    seq2 = np.stack([recon(masked2[e], masks2[e]) for e in range(3)])
    got2 = recon.batch(masked2, masks2)
    # vmap changes f32 fusion/reduction order; outputs are x255-scaled
    np.testing.assert_allclose(got2, seq2, atol=1e-3)


def test_scan_variants_match_carry_program():
    """The scan-overhead knobs (scan_unroll, accum_mode=stacked) are pure
    scheduling transforms of the flattened multi-event program: per-window
    predictions are identical, only the order of the overlap scatter-adds
    changes (f32 non-associativity at the x255 output scale -> atol 1e-4)."""
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.inference.driver import SlidingWindowReconstructor
    from p2igan_tpu.models import P2IGenerator

    rng = np.random.default_rng(3)
    hw, t, ev_t = 16, 4, 12
    gen = P2IGenerator(H=hw, W=hw, length=t, num_res=1, base_channels=16,
                       idw_max_points=128, idw_chunk=256,
                       idw_factored=True, idw_shared_batch_mask=True)
    flat = np.zeros((hw * hw,), np.float32)
    flat[rng.choice(hw * hw, 11, replace=False)] = 1.0
    masks = np.broadcast_to(flat.reshape(1, 1, hw, hw, 1),
                            (2, ev_t, hw, hw, 1)).astype(np.float32)
    masked = rng.random((2, ev_t, hw, hw, 1)).astype(np.float32) * masks
    variables = gen.init(jax.random.key(0), jnp.asarray(masked[:, :t]),
                         jnp.asarray(masks[:, :t]))

    base = SlidingWindowReconstructor(gen, variables, stride=t, overlap=2,
                                      window_batch=2, t_bucket=ev_t)
    ref = base.batch(masked, masks)
    for kw in ({"scan_unroll": 2}, {"accum_mode": "stacked"},
               {"accum_mode": "stacked", "scan_unroll": 3}):
        recon = SlidingWindowReconstructor(gen, variables, stride=t,
                                           overlap=2, window_batch=2,
                                           t_bucket=ev_t, **kw)
        np.testing.assert_allclose(recon.batch(masked, masks), ref,
                                   atol=1e-4, err_msg=str(kw))
    with pytest.raises(ValueError, match="accum_mode"):
        SlidingWindowReconstructor(gen, variables, accum_mode="nope")


def test_gauge_budget_guard_checks_every_event():
    """An over-budget mask on a LATER event must fail loudly: batch() with
    per-event masks takes the vmap fallback where gauge selection runs on
    tracers and jnp.nonzero(size=...) silently truncates — the guard used to
    validate only event 0 (ADVICE r2)."""
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.inference.driver import SlidingWindowReconstructor
    from p2igan_tpu.models import P2IGenerator

    rng = np.random.default_rng(5)
    hw, t, ev_t = 16, 4, 8
    gen = P2IGenerator(H=hw, W=hw, length=t, num_res=1, base_channels=16,
                       idw_max_points=128, idw_chunk=256,
                       idw_factored=True, idw_shared_batch_mask=True)
    # budget = gauge_budget(128, 4) = 128 slots; event 0 stays under it,
    # event 1 carries 200 observed gauges
    masks = np.zeros((2, ev_t, hw, hw, 1), np.float32)
    ok = np.zeros((hw * hw,), np.float32)
    ok[rng.choice(hw * hw, 11, replace=False)] = 1.0
    over = np.zeros((hw * hw,), np.float32)
    over[rng.choice(hw * hw, 200, replace=False)] = 1.0
    masks[0] = np.broadcast_to(ok.reshape(1, hw, hw, 1), (ev_t, hw, hw, 1))
    masks[1] = np.broadcast_to(over.reshape(1, hw, hw, 1), (ev_t, hw, hw, 1))
    masked = rng.random((2, ev_t, hw, hw, 1)).astype(np.float32) * masks
    variables = gen.init(jax.random.key(0), jnp.asarray(masked[:1, :t]),
                         jnp.asarray(masks[:1, :t]))
    recon = SlidingWindowReconstructor(gen, variables, stride=t, overlap=1,
                                       window_batch=2, t_bucket=ev_t)
    with pytest.raises(ValueError, match="observed gauges"):
        recon.batch(masked, masks)


@pytest.mark.slow
def test_run_inference_dk_model(tmp_path, monkeypatch):
    """The inference CLI path must serve the DeepKriging family too
    (reference infer.py:83-106 resolves dk/stdk sample_length from
    test-or-train config); previously only 'simple' went through
    run_inference."""
    monkeypatch.setenv("P2IGAN_FORCE_FILE_TRACKER", "1")
    fake.write_h5_events(tmp_path / "events", n_events=1, T=8, H=32, W=32)
    mask_file = fake.write_gauge_mask(tmp_path / "mask.txt", H=32, W=32,
                                      n_gauges=20)
    cfg = {
        "seed": 1,
        "save_dir": str(tmp_path / "weights"),
        "model": {"name": "dk", "in_channels": 1, "base_channels": 8},
        "data": {
            "train": {"data_root": str(tmp_path / "events"), "w": 32, "h": 32,
                      "sample_length": 4,
                      "mask": {"type": "stis", "file": str(mask_file)}},
            "test": {"data_root": str(tmp_path / "events"), "w": 32, "h": 32,
                     "sample_length": 4},
        },
        "loss": {"use_gan": 0, "k1_weight": 0.0},
        "train": {"optimizer": {"lr": 1e-3}, "batch_size": 1, "num_workers": 1,
                  "iterations": 1, "log_step": 1, "use_validation": False},
    }
    from p2igan_tpu.training.trainer import Trainer

    Trainer(cfg).train()
    out = run_inference(cfg, stride=4, overlap=2, overwrite=True)
    g = zarrlite.open(out, mode="r")
    assert g.attrs["model_name"] == "dk"
    # test sample_length=4 truncates the 8-frame event (reference
    # sti_dataset.py sample_length semantics)
    ev = g["event_01"][:]
    assert ev.shape == (4, 32, 32, 1)
    assert np.isfinite(ev).all()


def test_n_scan_chunks_matches_program_tables():
    """FLOP-accounting helper (PROFILE.md round-3 correction): the scan trip
    count used to rescale XLA cost_analysis (which counts a lax.scan body
    once) must equal the flattened program's actual chunk table length."""
    from p2igan_tpu.inference.driver import SlidingWindowReconstructor

    for stride, overlap, wb, T, E in ((16, 12, 8, 64, 32), (16, 12, 8, 64, 1),
                                      (4, 2, 2, 8, 2), (16, 12, 5, 64, 3)):
        r = SlidingWindowReconstructor(None, {}, stride=stride,
                                       overlap=overlap, window_batch=wb)
        win_idx, _ = r._window_tables(T, E, wb)
        assert win_idx.shape[0] % wb == 0
        assert r.n_scan_chunks(T, E) == win_idx.shape[0] // wb
