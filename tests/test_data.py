import numpy as np
import pytest

from p2igan_tpu.data import fake
from p2igan_tpu.data.datamodule import Loader, P2IDataModule, collate_pad_last
from p2igan_tpu.data.stores import EventDataset, ZarrWindowDataset, extract_number


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("fakedata")
    return fake.make_fake_benchmark_tree(root, H=64, W=64, T=12), root


def test_extract_number():
    assert extract_number("202101010000.h5") == 202101010000
    assert extract_number("event3.h5") == 3
    assert extract_number("nodigits.dat") == -1


def test_event_dataset_h5(tree):
    paths, root = tree
    ds = EventDataset({
        "data_root": str(root / "test_events"), "w": 48, "h": 48,
        "sample_length": 8,
        "mask": {"type": "stis", "file": str(paths["gauge_mask"])},
    })
    # stis mask is 64x64 while video is 64x64 pre-crop; mask applied pre-crop
    video, masked, mask = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert video.shape == (8, 48, 48, 1)
    assert masked.shape == mask.shape == video.shape
    assert video.dtype == np.float32 and video.max() <= 1.0
    np.testing.assert_allclose(masked, video * mask)


def test_event_dataset_zarr(tree):
    paths, root = tree
    ds = EventDataset({
        "data_root": str(root / "nimrod_test.zarr"), "w": 64, "h": 64,
        "mask": {"type": "sti", "block_sizes": [8]},
    })
    assert len(ds) == 2
    video, masked, mask = ds.__getitem__(1, rng=np.random.default_rng(1))
    assert video.shape[1:] == (64, 64, 1)
    # sti: constant mask across frames
    assert np.all(mask == mask[0])


def test_zarr_window_dataset(tree):
    paths, root = tree
    ds = ZarrWindowDataset({
        "data_root": str(root / "nimrod_train.zarr"), "w": 48, "h": 48,
        "mask": {"type": "sti", "block_sizes": [8]},
    })
    assert len(ds) > 0
    video, masked, mask = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert video.shape == (12, 48, 48, 1)
    np.testing.assert_allclose(masked, video * mask)
    # determinism given the same rng seed
    v2, m2, k2 = ds.__getitem__(0, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(video, v2)
    np.testing.assert_array_equal(mask, k2)


def test_collate_pads_last_frame():
    a = (np.ones((4, 2, 2, 1), np.float32), np.ones((4, 2, 2, 1), np.float32),
         np.ones((4, 2, 2, 1), np.float32))
    b0 = np.arange(2 * 2 * 2).reshape(2, 2, 2, 1).astype(np.float32)
    b = (b0, b0, b0)
    videos, masked, masks = collate_pad_last([a, b])
    assert videos.shape == (2, 4, 2, 2, 1)
    np.testing.assert_array_equal(videos[1, 2], b0[-1])
    np.testing.assert_array_equal(videos[1, 3], b0[-1])


def test_datamodule_zarr_train_split(tree):
    paths, root = tree
    cfg = {
        "seed": 42,
        "data": {
            "train": {"data_root": str(root / "nimrod_train.zarr"), "w": 48,
                      "h": 48, "sample_length": 12,
                      "mask": {"type": "sti", "block_sizes": [8]}},
            "test": {"data_root": str(root / "nimrod_test.zarr"), "w": 64, "h": 64,
                     "sample_length": None},
        },
        "train": {"batch_size": 2, "num_workers": 2},
    }
    dm = P2IDataModule(cfg)
    n_total = len(dm.train_dataset) + len(dm.valid_dataset)
    assert len(dm.valid_dataset) == int(n_total * 0.2)
    train_loader = dm.train_dataloader()
    videos, masked, masks = next(iter(train_loader))
    assert videos.shape == (2, 12, 48, 48, 1)
    test_loader = dm.test_dataloader()
    assert test_loader.batch_size == 1
    tv, tm, tk = next(iter(test_loader))
    assert tv.shape[0] == 1 and tv.shape[1] == 12  # full event length


def test_loader_epoch_reshuffle(tree):
    paths, root = tree
    ds = ZarrWindowDataset({
        "data_root": str(root / "nimrod_train.zarr"), "w": 48, "h": 48,
        "mask": {"type": "nowcasting", "keep": 4},
    })
    loader = Loader(ds, batch_size=4, shuffle=True, seed=0, num_workers=2)
    n1 = sum(v.shape[0] for v, _, _ in loader)
    assert n1 == len(ds)
    assert loader.epoch == 1


def test_raw_pipeline_ships_thin_frame_constant_masks(tree):
    """device_decode raw mode with sti/stis masks ships ONE mask frame per
    sample ((1,H,W,1) item, (B,1,H,W,1) after collate) — the device decode
    broadcasts via its block index map — while per-frame mask types (fi,
    nowcasting, stin) still ship full (T,H,W,1) masks."""
    paths, root = tree
    base = {"data_root": str(root / "nimrod_train.zarr"), "w": 48, "h": 48,
            "device_decode": True}
    ds = ZarrWindowDataset({**base, "mask": {"type": "sti",
                                             "block_sizes": [8]}})
    v, m = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert v.dtype == m.dtype == np.uint8
    assert m.shape == (1, 48, 48, 1) and v.shape[0] > 1
    vb, mb = collate_pad_last([ds.__getitem__(i, rng=np.random.default_rng(i))
                               for i in (0, 1)])
    assert mb.shape == (2, 1, 48, 48, 1) and vb.shape[1] == v.shape[0]

    ds_fi = ZarrWindowDataset({**base, "mask": {"type": "fi",
                                                "interval": [2]}})
    _, m_fi = ds_fi.__getitem__(0, rng=np.random.default_rng(0))
    assert m_fi.shape[0] == v.shape[0]  # per-frame masks stay full length


def test_event_dataset_video_branch(tmp_path):
    """Video events (.avi) decode through the reference's video path
    (sti_dataset.py:178-182): RGB frames -> /255 -> channel-mean grayscale ->
    mask -> crop. Uses the OpenCV fallback (decord absent here)."""
    cv2 = pytest.importorskip("cv2")

    h = w = 32
    t = 6
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(t, h, w), dtype=np.uint8)
    path = tmp_path / "event_1.avi"
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 5.0,
                         (w, h), True)
    assert vw.isOpened(), "cv2 cannot encode MJPG avi in this environment"
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
    vw.release()

    from p2igan_tpu.data.stores import EventDataset

    ds = EventDataset({"data_root": str(tmp_path), "w": w, "h": h,
                       "sample_length": 4,
                       "mask": {"type": "nowcasting", "keep": 2}})
    assert len(ds) == 1
    video, masked, mask = ds.__getitem__(0, rng=np.random.default_rng(1))
    assert video.shape == (4, h, w, 1)
    assert masked.shape == mask.shape == video.shape
    # MJPG is lossy: grayscale values round-trip within a few uint8 steps
    want = frames[:4].astype(np.float32)[..., None] / 255.0
    assert np.abs(video - want).mean() < 0.03
    np.testing.assert_array_equal(masked, video * mask)
    # nowcasting mask keeps the first `keep` frames
    np.testing.assert_array_equal(mask[:2], np.ones_like(mask[:2]))
    np.testing.assert_array_equal(mask[2:], np.zeros_like(mask[2:]))


def test_preprocess_cli_builds_train_zarr(tmp_path):
    """scripts/preprocess.py (reference preprocess.py:130-233): h5 events ->
    events/<ts>/frames uint8 + index/windows, readable by ZarrWindowDataset."""
    import subprocess
    import sys

    import h5py

    h5_dir = tmp_path / "h5"
    h5_dir.mkdir()
    rng = np.random.default_rng(0)
    lengths = {101: 9, 205: 6}
    for ts, t in lengths.items():
        with h5py.File(h5_dir / f"event_{ts}.h5", "w") as f:
            f.create_dataset(
                "frames", data=rng.integers(0, 255, (t, 16, 16), dtype=np.uint8))

    out = tmp_path / "train.zarr"
    subprocess.run(
        [sys.executable, "scripts/preprocess.py", "--h5-dir", str(h5_dir),
         "--output", str(out), "--window", "4", "--stride", "2"],
        check=True, capture_output=True)

    from p2igan_tpu.data import zarrlite

    root = zarrlite.open_group(out)
    assert root.attrs["suggested_window"] == 4
    # timestamp-sorted event ids; windows = [event_id, start, length]
    idx = root["index"]["windows"][:]
    want = [[0, s, 4] for s in range(0, 9 - 4 + 1, 2)] \
        + [[1, s, 4] for s in range(0, 6 - 4 + 1, 2)]
    np.testing.assert_array_equal(idx, np.asarray(want, np.int32))
    with h5py.File(h5_dir / "event_101.h5", "r") as f:
        np.testing.assert_array_equal(root["events"]["101"]["frames"][:],
                                      f["frames"][:])

    ds = ZarrWindowDataset({"data_root": str(out), "w": 16, "h": 16,
                            "sample_length": 4,
                            "mask": {"type": "nowcasting", "keep": 2}})
    assert len(ds) == len(want)
    video, masked, mask = ds.__getitem__(0, rng=np.random.default_rng(1))
    assert video.shape == (4, 16, 16, 1)
    np.testing.assert_array_equal(masked, video * mask)


def test_zarr_window_dataset_rejects_oversized_crop(tmp_path):
    """A crop larger than the stored frames must raise a named ValueError
    instead of a cryptic rng.integers(low >= high) inside a worker."""
    import pytest

    from p2igan_tpu.data import fake
    from p2igan_tpu.data.stores import ZarrWindowDataset

    root = fake.write_train_zarr(tmp_path / "train.zarr", n_events=1, T=6,
                                 H=16, W=16, window=4)
    ds = ZarrWindowDataset({"data_root": str(root), "h": 32, "w": 32,
                            "sample_length": 4,
                            "mask": {"type": "sti", "block_sizes": [4]}})
    with pytest.raises(ValueError, match="crop"):
        ds[0]
