"""Render the first frames of an inference zarr to a stats-annotated GIF
(reference ``scripts/visualize.py``)."""

from __future__ import annotations

# Allow running as `python scripts/<name>.py` without installing the package.
import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
from pathlib import Path

import imageio
import numpy as np

from p2igan_tpu.data import zarrlite


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Preview an inference zarr as a GIF")
    p.add_argument("--zarr", type=Path, required=True)
    p.add_argument("--output", type=Path, default=Path("preview.gif"))
    p.add_argument("--num-frames", type=int, default=24)
    p.add_argument("--fps", type=int, default=4)
    p.add_argument("--event", type=str, default=None,
                   help="Event key (default: first array in the store)")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    z = zarrlite.open(args.zarr, mode="r")
    keys = sorted(z.array_keys()) if hasattr(z, "array_keys") else []
    if args.event is None and not keys:
        raise SystemExit(
            f"{args.zarr} has no root-level event arrays (train stores nest "
            "frames under events/<ts>); point --zarr at an inference-output "
            "or test store, or pass --event <group/path>")
    event_key = args.event or keys[0]
    data = z[event_key][:args.num_frames]

    frames = []
    for t in range(data.shape[0]):
        frame = data[t]
        if frame.ndim == 3 and frame.shape[0] == 1:
            frame = frame[0]
        if frame.ndim == 3 and frame.shape[-1] == 1:
            frame = frame[..., 0]
        vmin, vmax, vmean = float(frame.min()), float(frame.max()), float(frame.mean())
        fig, ax = plt.subplots(figsize=(4, 4))
        im = ax.imshow(frame, cmap="viridis", vmin=vmin, vmax=vmax)
        ax.set_title(f"t={t}\nmin={vmin:.3f} max={vmax:.3f} mean={vmean:.3f}")
        ax.axis("off")
        fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
        fig.canvas.draw()
        img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        frames.append(img)
        plt.close(fig)

    imageio.mimsave(args.output, frames, fps=args.fps)
    print(f"Saved GIF to {args.output}")


if __name__ == "__main__":
    main()
