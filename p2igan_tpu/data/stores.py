"""Event datastores: per-event HDF5/Zarr readers and sliding-window training.

Re-designs of reference ``p2igan_bench/data/sti_dataset.py``:

* ``EventDataset``  — one item per event file/array: ``.h5`` (``frames``
  dataset), zarr flat arrays, or video files (decord, optional); normalizes
  to (T, H, W, 1) float32/255, optional ``sample_length`` truncation, RGB ->
  gray mean, mask application, center crop (sti_dataset.py:124-239).
* ``ZarrWindowDataset`` — sliding windows over ``events/<key>/frames``
  (T, H, W uint8) indexed by ``index/windows`` (N, 3) = [event_id, start_t,
  length]; per item: random spatial crop, minimal chunk-aligned window read,
  /255, mask (sti_dataset.py:245-324).

Items are triples ``(video, masked_video, mask)`` of float32 (T, H, W, C)
numpy arrays in [0, 1]; randomness is an explicit ``numpy.random.Generator``
per item (derived from (seed, epoch, index) by the loader) instead of global
state.
"""

from __future__ import annotations

import os
import re

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from . import zarrlite
from .masks import create_mask_np

Item = Tuple[np.ndarray, np.ndarray, np.ndarray]


def extract_number(filename: str) -> int:
    match = re.search(r"\d+", filename)
    return int(match.group()) if match else -1


class _MaskMixin:
    def _init_mask_cfg(self, args: Dict[str, Any]) -> None:
        mask_cfg = args.get("mask", {}) or {}
        self.mask_type = mask_cfg.get("type", "sti")
        self.mask_file = mask_cfg.get("file")
        self.block_sizes = mask_cfg.get("block_sizes", [4])
        self.mask_keep = mask_cfg.get("keep", 4)
        self.mask_interval = mask_cfg.get("interval", [2, 5])
        # sti/stis broadcast one (H, W) pattern over all frames
        # (masks.py create_mask_np); fi/nowcasting/stin vary per frame
        self.mask_frame_constant = self.mask_type in ("sti", "stis")

    def _make_mask(self, shape, rng: np.random.Generator) -> np.ndarray:
        return create_mask_np(
            shape, rng, mask_type=self.mask_type, mask_file=self.mask_file,
            block_sizes=self.block_sizes, keep=self.mask_keep,
            interval=self.mask_interval,
        )


class EventDataset(_MaskMixin):
    """Per-event reader (reference ``Dataset``)."""

    def __init__(self, args: Dict[str, Any]):
        self.args = args
        self.data_root = str(args["data_root"])
        self.is_zarr = self.data_root.endswith(".zarr")
        self.zarr_root = None
        if self.is_zarr:
            self.zarr_root = zarrlite.open(self.data_root, mode="r")
            # Lexicographic event order — parity with the reference's
            # `sorted(zarr_root.array_keys())` (sti_dataset.py:162-166). Note
            # the file branch below sorts by embedded number instead, so with
            # >= 100 events ("event_100" < "event_11" lexicographically) the
            # two input formats disagree on ordering — in the reference too.
            # The shipped converters (scripts/tozarr.py) zero-pad to 2 digits,
            # which keeps both orders identical up to 99 events.
            self.video_files: List[str] = list(self.zarr_root.array_keys())
        else:
            self.video_files = sorted(
                [
                    os.path.join(self.data_root, f)
                    for f in os.listdir(self.data_root)
                    if f.endswith((".mp4", ".avi", ".h5"))
                ],
                key=lambda f: extract_number(os.path.basename(f)),
            )
        self._init_mask_cfg(args)
        self.width = args["w"]
        self.height = args["h"]
        self.sample_length = args.get("sample_length")

    def __len__(self) -> int:
        return len(self.video_files)

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None) -> Item:
        if idx >= len(self.video_files):
            raise IndexError(
                f"Index {idx} out of range for dataset with {len(self.video_files)} samples.")
        rng = rng or np.random.default_rng()
        return self._process_file(self.video_files[idx], rng)

    # -- readers -----------------------------------------------------------
    def _process_file(self, file_path: str, rng) -> Item:
        if self.is_zarr:
            data = self._read_zarr(file_path)
        elif file_path.endswith((".mp4", ".avi")):
            data = self._read_video(file_path)
        elif file_path.endswith(".h5"):
            data = self._read_hdf5(file_path)
        else:
            raise ValueError(f"Unsupported file format: {file_path}")
        return self._post_process(data, rng)

    @staticmethod
    def _read_hdf5(path: str) -> np.ndarray:
        import h5py

        with h5py.File(path, "r") as f:
            data = f["frames"][:]
        if data.ndim == 3:
            data = data[..., np.newaxis]
        return data

    def _read_zarr(self, key: str) -> np.ndarray:
        data = np.asarray(self.zarr_root[key][:])
        if data.ndim == 3:
            data = data[..., np.newaxis]
        elif data.ndim == 4 and data.shape[-1] != 1:
            data = np.mean(data, axis=-1, keepdims=True)
        return data

    @staticmethod
    def _read_video(path: str) -> np.ndarray:
        """Decode a video file to (T, H, W, 3) RGB uint8.

        Reference sti_dataset.py:178-182 uses decord; decord is optional here
        with an OpenCV fallback (same RGB layout — and the downstream
        channel-mean to grayscale is order-invariant anyway)."""
        try:
            from decord import VideoReader  # optional dependency

            vr = VideoReader(path)
            return vr.get_batch(range(len(vr))).asnumpy()
        except ImportError:
            pass
        try:
            import cv2
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "decord or opencv is required for video files") from e
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise IOError(f"cannot open video: {path}")
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        cap.release()
        if not frames:
            raise IOError(f"no frames decoded from video: {path}")
        return np.stack(frames)

    # -- normalization ------------------------------------------------------
    def _post_process(self, video: np.ndarray, rng) -> Item:
        if self.sample_length is not None:
            video = video[: min(self.sample_length, video.shape[0])]
        video = video.astype(np.float32) / 255.0
        if video.shape[-1] == 3:
            video = np.mean(video, axis=-1, keepdims=True)
        mask = self._make_mask(video.shape, rng)
        masked = video * mask
        return (self._crop_center(video), self._crop_center(masked),
                self._crop_center(mask))

    def _crop_center(self, data: np.ndarray) -> np.ndarray:
        if data.shape[1] == self.height and data.shape[2] == self.width:
            return data
        old_h, old_w = data.shape[1], data.shape[2]
        y0 = max((old_h - self.height) // 2, 0)
        x0 = max((old_w - self.width) // 2, 0)
        return data[:, y0:y0 + self.height, x0:x0 + self.width, :]


class ZarrWindowDataset(_MaskMixin):
    """Sliding-window training reads (reference ``Dataset_ZarrTrain``)."""

    def __init__(self, args: Dict[str, Any]):
        self.zarr_path = str(args["data_root"])
        self.root = zarrlite.open(self.zarr_path, mode="r")
        self.events_grp = self.root["events"]
        self.index_arr = np.asarray(self.root["index"]["windows"][:])
        self.event_keys = sorted(self.events_grp.keys())  # timestamp order
        self.window = args.get("sample_length",
                               self.root.attrs.get("suggested_window", 20))
        self.crop_h = args["h"]
        self.crop_w = args["w"]
        # raw mode ships (uint8 video, uint8 mask) pairs; the fused decode +
        # normalize + mask runs on device (ops/pallas/decode_mask.py), cutting
        # host->device bytes 4x vs the float pipeline
        self.raw = bool(args.get("device_decode", False))
        self._init_mask_cfg(args)
        self._frames_cache: Dict[str, Any] = {}

    def __len__(self) -> int:
        return self.index_arr.shape[0]

    def _frames(self, key: str):
        arr = self._frames_cache.get(key)
        if arr is None:
            arr = self.events_grp[key]["frames"]
            self._frames_cache[key] = arr
        return arr

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None) -> Item:
        rng = rng or np.random.default_rng()
        event_id, start_t, length = (int(v) for v in self.index_arr[idx])
        frames_z = self._frames(self.event_keys[event_id])
        T, H, W = frames_z.shape

        if H == self.crop_h and W == self.crop_w:
            y0 = x0 = 0
        else:
            if H < self.crop_h or W < self.crop_w:
                raise ValueError(
                    f"train.zarr event '{self.event_keys[event_id]}' frames are "
                    f"({H}, {W}) but data config asks for a ({self.crop_h}, "
                    f"{self.crop_w}) crop; crop must not exceed the stored "
                    f"frame size")
            y0 = int(rng.integers(0, H - self.crop_h + 1))
            x0 = int(rng.integers(0, W - self.crop_w + 1))

        video = frames_z[start_t:start_t + length,
                         y0:y0 + self.crop_h, x0:x0 + self.crop_w]
        if self.raw:
            video_u8 = np.ascontiguousarray(video)[..., np.newaxis]
            # sti/stis masks broadcast ONE spatial pattern over T (masks.py
            # create_mask_np, T-independent RNG draws): generate and ship a
            # single frame — no host-side T-fold materialization — and the
            # device decode's index-map path broadcasts it for free
            mshape = ((1,) + video_u8.shape[1:] if self.mask_frame_constant
                      else video_u8.shape)
            mask = self._make_mask(mshape, rng)
            return video_u8, mask.astype(np.uint8)
        video = (video.astype(np.float32) / 255.0)[..., np.newaxis]
        mask = self._make_mask(video.shape, rng)
        return video, video * mask, mask
