"""H5 -> Zarr test-set converter (reference ``scripts/tozarr.py``).

Converts per-event ``<id>.h5`` storm files into a flat test store with
``event_%02d`` float32 arrays and rich dataset/event attrs. Unlike the
reference (hard-coded NAS paths and an inline event table), paths and the
optional event-metadata table are CLI arguments.
"""

from __future__ import annotations

# Allow running as `python scripts/<name>.py` without installing the package.
import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import json
import os
import re
from pathlib import Path

import h5py
import numpy as np

from p2igan_tpu.data import zarrlite


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Convert per-event h5 files to a test zarr")
    p.add_argument("--h5-dir", type=Path, required=True,
                   help="Directory of <id>.h5 event files (dataset 'frames').")
    p.add_argument("--output", type=Path, required=True, help="Output .zarr path")
    p.add_argument("--event-table", type=Path, default=None,
                   help="Optional JSON list of event metadata dicts (id, start, "
                        "end, duration, max_rg, max_rd, mean_rg, mean_rd).")
    p.add_argument("--dataset-name", type=str, default="Nimrod_2D_val")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    table = None
    if args.event_table is not None:
        table = {int(e["id"]): e for e in json.loads(args.event_table.read_text())}

    def extract_eid(f: str) -> int:
        # search the STEM, not the '.h5' suffix; digit-free names error
        m = re.search(r"\d+", os.path.splitext(f)[0])
        if m is None:
            raise ValueError(f"cannot extract an event id from {f!r}")
        return int(m.group())

    files = sorted(
        [f for f in os.listdir(args.h5_dir) if f.endswith(".h5")],
        key=extract_eid,
    )
    eids = [extract_eid(f) for f in files]
    if len(set(eids)) != len(eids):
        dupes = sorted({e for e in eids if eids.count(e) > 1})
        raise SystemExit(
            f"duplicate event ids {dupes} extracted from {args.h5_dir}: "
            "each event_NN dataset would silently overwrite its twin")
    root = zarrlite.open_group(args.output, mode="w")
    root.attrs.update({
        "dataset_name": args.dataset_name,
        "description": "Rain field data for storm events",
        "num_events": len(files),
        "time_unit": "minutes",
        "time_resolution": 5,
        "value_unit": "mm/h",
        "missing_value": 0.0,
    })

    for fname in files:
        eid = extract_eid(fname)
        with h5py.File(args.h5_dir / fname, "r") as f:
            data = f["frames"][:]
        if data.ndim == 4 and data.shape[1] == 1:
            data = data[:, 0]
        T = data.shape[0]
        arr = root.create_dataset(
            f"event_{eid:02d}", shape=data.shape, chunks=data.shape,
            dtype="float32", data=data.astype(np.float32), overwrite=True,
        )
        attrs = {"event_id": eid, "num_frames": T, "source_file": fname}
        if table and eid in table:
            e = table[eid]
            attrs.update({
                "start_time": e.get("start"), "end_time": e.get("end"),
                "duration_hours": e.get("duration"),
                "max_rainfall_rg_mm": e.get("max_rg"),
                "max_rainfall_rd_mm": e.get("max_rd"),
                "mean_rainfall_rg_mm": e.get("mean_rg"),
                "mean_rainfall_rd_mm": e.get("mean_rd"),
            })
        arr.attrs.update(attrs)
        print(f"{fname} -> event_{eid:02d} ({T} frames)")

    print(f"Zarr dataset created at: {args.output}")


if __name__ == "__main__":
    main()
