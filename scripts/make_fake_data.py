"""Generate the fake benchmark dataset tree (the README smoke-test data).

Creates ``datasets/fake/`` with per-event h5 test events, flat test zarr,
sliding-window train zarr, and gauge mask txt files — everything the shipped
configs reference.
"""

from __future__ import annotations

# Allow running as `python scripts/<name>.py` without installing the package.
import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
from pathlib import Path

from p2igan_tpu.data.fake import make_fake_benchmark_tree


def main() -> None:
    p = argparse.ArgumentParser(description="Generate fake benchmark data")
    p.add_argument("--root", type=Path, default=Path("datasets/fake"))
    p.add_argument("--size", type=int, default=128, help="Spatial H=W")
    p.add_argument("--frames", type=int, default=16, help="Frames per test event")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    paths = make_fake_benchmark_tree(args.root, H=args.size, W=args.size,
                                     T=args.frames, seed=args.seed)
    for k, v in paths.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
