"""On-chip GAN convergence smoke (VERDICT r4 item 4b).

Runs the REAL training path — fake train.zarr -> ZarrWindowDataset ->
device prefetch -> compiled GAN step (reference protocol:
scripts/train.py:185-225 trains from config; this uses the shipped
p2igan_gan_baseline_gauge.json with only size/iteration knobs overridden)
— for a few hundred optimizer steps and records the rec-loss trajectory.

Parity tests prove the step's arithmetic matches the reference; the
overfit-one-batch test proves gradients point downhill on a toy batch.
This smoke is the remaining end-to-end evidence: the full CLI pipeline
(real data store, masks from the gauge file, hinge GAN, mu-free Adam)
actually LEARNS on chip. The trajectory + an example image go into
BASELINE.md / docs/.

The fake train store is sized so the run fits in ~2 epochs (per-epoch
checkpoint saves fetch the full state through the slow device tunnel —
a tiny store would spend the budget on saves, not steps).

Usage:
    python scripts/convergence_smoke.py [--steps 400] [--append]
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
import shutil
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/p2igan_jax_cache"))
# route tracking into the smoke workdir BEFORE p2igan_tpu imports create
# the module-level FileTracker
_WORKDIR = Path(os.environ.get("P2I_SMOKE_DIR", "/tmp/p2i_smoke"))
os.environ["P2IGAN_TRACKING_DIR"] = str(_WORKDIR / "mlruns")

def build_data(root: Path, n_events: int, event_t: int, seed: int = 0,
               H: int = 128, W: int = 128, T: int = 16):
    from p2igan_tpu.data.fake import write_gauge_mask, write_train_zarr

    train_zarr = root / "nimrod_train.zarr"
    mask_txt = root / "masks" / "gauge_mask_128_train.txt"
    if not train_zarr.exists():
        write_train_zarr(train_zarr, n_events=n_events, T=event_t, H=H, W=W,
                         window=T, stride=1, seed=seed + 2)
    if not mask_txt.exists():
        write_gauge_mask(mask_txt, H=H, W=W, seed=seed + 3,
                         n_gauges=min(79, H * W // 16))
    return train_zarr, mask_txt


def smoke_config(train_zarr: Path, mask_txt: Path, steps: int,
                 log_step: int, H: int = 128, W: int = 128, T: int = 16,
                 batch: int = 12) -> dict:
    from p2igan_tpu.config import load_config

    cfg = load_config(Path(_repo) / "p2igan_tpu/config/"
                      "p2igan_gan_baseline_gauge.json")
    cfg["save_dir"] = str(_WORKDIR / "weights")
    cfg["experiment_name"] = "convergence-smoke"
    cfg["run_name"] = "smoke"
    # reference constraint: base_channels == 4 * sample_length
    cfg["model"]["base_channels"] = 4 * T
    cfg["data"]["train"].update({"data_root": str(train_zarr), "w": W,
                                 "h": H, "sample_length": T})
    cfg["data"]["train"]["mask"]["file"] = str(mask_txt)
    cfg["data"].pop("test", None)  # train-only smoke
    cfg["train"]["iterations"] = steps
    cfg["train"]["log_step"] = log_step
    cfg["train"]["batch_size"] = batch
    cfg["train"]["use_validation"] = False
    cfg["train"]["use_test"] = False
    return cfg


def read_trajectory(mlruns: Path, key: str = "train/rec_loss"):
    """[(step, value)] for ``key`` across the newest smoke run."""
    runs = sorted(mlruns.glob("convergence-smoke/*/metrics.jsonl"),
                  key=lambda p: p.stat().st_mtime)
    if not runs:
        return []
    out = []
    for line in runs[-1].read_text().splitlines():
        rec = json.loads(line)
        if rec["key"] == key and rec["value"] is not None:
            out.append((rec["step"], rec["value"]))
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--log-step", type=int, default=20)
    ap.add_argument("--events", type=int, default=48,
                    help="fake train events (sized for ~2 epochs)")
    ap.add_argument("--event-frames", type=int, default=80)
    ap.add_argument("--size", type=int, default=128, help="spatial H=W")
    ap.add_argument("--frames", type=int, default=16,
                    help="sample_length (base_channels = 4x this)")
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--learn-ratio", type=float, default=0.7,
                    help="LEARNS iff tail_mean < ratio * first (1.0+ "
                         "disables the gate for harness smoke tests)")
    ap.add_argument("--append", action="store_true",
                    help="append the trajectory summary to BASELINE.md and "
                         "copy the final example image to docs/")
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the smoke workdir first")
    args = ap.parse_args()

    if args.fresh and _WORKDIR.exists():
        shutil.rmtree(_WORKDIR)
    _WORKDIR.mkdir(parents=True, exist_ok=True)

    import jax

    from p2igan_tpu.training.trainer import Trainer

    train_zarr, mask_txt = build_data(_WORKDIR / "data", args.events,
                                      args.event_frames, H=args.size,
                                      W=args.size, T=args.frames)
    cfg = smoke_config(train_zarr, mask_txt, args.steps, args.log_step,
                       H=args.size, W=args.size, T=args.frames,
                       batch=args.batch)
    print(f"backend={jax.default_backend()}  steps={args.steps}  "
          f"store={train_zarr}", flush=True)

    t0 = time.time()
    trainer = Trainer(cfg)
    trainer.train()
    wall = time.time() - t0

    traj = read_trajectory(_WORKDIR / "mlruns")
    dis = read_trajectory(_WORKDIR / "mlruns", "train/dis_loss")
    if not traj:
        raise SystemExit("no train/rec_loss metrics recorded — smoke FAILED")
    first, last = traj[0][1], traj[-1][1]
    # trajectory can be noisy batch-to-batch; compare first vs the mean of
    # the final quarter of logged points
    tail = [v for _, v in traj[-max(1, len(traj) // 4):]]
    tail_mean = sum(tail) / len(tail)
    print("\nrec-loss trajectory (step, value):", flush=True)
    for s, v in traj:
        print(f"  {s:5d}  {v:.4f}", flush=True)
    verdict = ("LEARNS" if tail_mean < args.learn_ratio * first
               else "NO-IMPROVEMENT")
    print(f"\nfirst={first:.4f}  last={last:.4f}  tail_mean={tail_mean:.4f}"
          f"  ratio={tail_mean / first:.3f}  [{verdict}]  "
          f"({wall:.0f}s wall)", flush=True)

    if args.append:
        pts = "  ".join(f"{s}:{v:.3f}" for s, v in traj)
        lines = [
            "",
            f"### GAN convergence smoke ({args.steps} steps on-chip, "
            "scripts/convergence_smoke.py)",
            "",
            "Full CLI training path (fake train.zarr, stis gauge mask, "
            "hinge GAN, batch 12, mu-free Adam) — `train/rec_loss` every "
            f"{args.log_step} steps:",
            "",
            f"    {pts}",
            "",
            f"first={first:.4f}, final-quarter mean={tail_mean:.4f} "
            f"({tail_mean / first:.2f}x) -> **{verdict}**; "
            f"dis_loss {dis[0][1]:.3f} -> {dis[-1][1]:.3f}."
            if dis else
            f"first={first:.4f}, final-quarter mean={tail_mean:.4f} "
            f"({tail_mean / first:.2f}x) -> **{verdict}**.",
            "",
            "![convergence example](docs/convergence_smoke.png)",
        ]
        with open(Path(_repo) / "BASELINE.md", "a") as f:
            f.write("\n".join(lines) + "\n")
        # newest train example image rendered by the Trainer
        imgs = sorted((_WORKDIR / "weights" / "artifacts").glob("train_*.png"),
                      key=lambda p: p.stat().st_mtime)
        if imgs:
            dst = Path(_repo) / "docs"
            dst.mkdir(exist_ok=True)
            shutil.copy2(imgs[-1], dst / "convergence_smoke.png")
            print(f"example image -> {dst / 'convergence_smoke.png'}",
                  flush=True)

    if verdict != "LEARNS":
        raise SystemExit(1)


if __name__ == "__main__":
    main()
