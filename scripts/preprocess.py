"""H5 -> Zarr train-set builder (reference ``scripts/preprocess.py:130-233``).

Packs timestamp-sorted event h5 files into ``events/<ts>/frames`` uint8
chunks with a sliding-window index ``index/windows`` (N, 3) =
[event_id, start_t, length] and a ``suggested_window`` attr. Chunking is
(window, spatial_chunk, spatial_chunk) zstd so the training reader's minimal
window reads stay chunk-aligned.
"""

from __future__ import annotations

# Allow running as `python scripts/<name>.py` without installing the package.
import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import os
import re
from pathlib import Path

import h5py
import numpy as np

from p2igan_tpu.data import zarrlite


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Build sliding-window training zarr")
    p.add_argument("--h5-dir", type=Path, required=True)
    p.add_argument("--output", type=Path, required=True)
    p.add_argument("--window", type=int, default=20)
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--spatial-chunk", type=int, default=128)
    return p.parse_args()


def main() -> None:
    args = parse_args()
    extract_ts = lambda f: int(re.search(r"\d+", f).group())  # noqa: E731
    h5_files = sorted(
        [f for f in os.listdir(args.h5_dir) if f.endswith(".h5")], key=extract_ts)

    root = zarrlite.open_group(args.output, mode="w")
    events_grp = root.create_group("events")
    index_grp = root.create_group("index")
    root.attrs.update({
        "dataset_name": "train",
        "description": "Radar events, event-based storage",
        "frame_unit": "mm/h (uint8 encoded)",
        "suggested_window": args.window,
    })

    window_index = []
    for event_id, fname in enumerate(h5_files):
        ts = extract_ts(fname)
        with h5py.File(args.h5_dir / fname, "r") as f:
            frames = f["frames"][:]
        if frames.ndim == 4 and frames.shape[-1] == 1:
            frames = frames[..., 0]
        T, H, W = frames.shape
        evt = events_grp.create_group(str(ts))
        sc = min(args.spatial_chunk, H, W)
        arr = evt.create_dataset(
            "frames", shape=frames.shape,
            chunks=(min(args.window, T), sc, sc), dtype="uint8",
            compressor={"id": "zstd", "level": 3},
            data=frames.astype(np.uint8),
        )
        arr.attrs.update({"event_id": event_id, "timestamp": ts,
                          "num_frames": T, "source_file": fname})
        starts = range(0, T - args.window + 1, args.stride)
        for start in starts:
            window_index.append([event_id, start, args.window])
        print(f"packed {fname}: {T} frames -> {len(starts)} windows")

    idx = index_grp.create_dataset(
        "windows", shape=(len(window_index), 3), chunks=(1024, 3), dtype="int32",
        compressor={"id": "zstd", "level": 3},
        data=np.asarray(window_index, np.int32),
    )
    idx.attrs.update({"columns": ["event_id", "start_t", "length"],
                      "description": "Sliding window index for training"})
    print(f"Zarr training dataset created at: {args.output}")
    print(f"Total training samples (windows): {len(window_index)}")


if __name__ == "__main__":
    main()
