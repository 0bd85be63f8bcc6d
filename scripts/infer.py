"""Inference CLI (reference ``scripts/infer.py`` argparse surface)."""

from __future__ import annotations

# Allow running as `python scripts/<name>.py` without installing the package.
import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import logging
from pathlib import Path
from typing import Optional

from p2igan_tpu.config import load_config
from p2igan_tpu.inference.driver import run_inference
from p2igan_tpu.utils.rng import seed_everything
from p2igan_tpu.utils.tracking import setup_logging


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Inference for P2I-GAN benchmark models (TPU)")
    parser.add_argument("--config", type=Path,
                        default=Path("p2igan_tpu/config/p2igan_baseline.json"))
    parser.add_argument("--checkpoint", type=Path, default=None,
                        help="Path to model checkpoint (.ckpt or torch .pt).")
    parser.add_argument("--model-dir", type=Path, default=None)
    parser.add_argument("--data-root", type=Path, default=None)
    parser.add_argument("--output", type=Path, default=None)
    parser.add_argument("--passes", type=int, default=1)
    parser.add_argument("--log-every", type=int, default=50)
    parser.add_argument("--stride", type=int, default=16)
    parser.add_argument("--overlap", type=int, default=12)
    parser.add_argument("--output-scale", type=float, default=255.0)
    parser.add_argument("--batch-events", type=int, default=1,
                        help="Equal-length events reconstructed per compiled "
                             "call (vmapped); 1 = sequential.")
    parser.add_argument("--window-batch", type=int, default=8,
                        help="Windows evaluated per generator call "
                             "(8 = measured optimum on v5e, PROFILE.md).")
    parser.add_argument("--scan-unroll", type=int, default=1,
                        help="lax.scan unroll factor over window chunks.")
    parser.add_argument("--accum-mode", type=str, default="carry",
                        choices=("carry", "stacked"),
                        help="Overlap accumulation: in-scan carry or one "
                             "post-scan scatter over stacked predictions.")
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--log-level", type=str, default="INFO")
    # accepted for reference-CLI compatibility; device selection is via JAX
    parser.add_argument("--device", type=str, default=None)
    return parser.parse_args()


def main(args: Optional[argparse.Namespace] = None) -> None:
    parsed = args or parse_args()
    setup_logging(parsed.log_level)
    logging.info("Loading config from %s", parsed.config)
    cfg = load_config(parsed.config)
    seed_everything(cfg.get("seed", 42))
    run_inference(
        cfg,
        checkpoint=str(parsed.checkpoint) if parsed.checkpoint else None,
        model_dir=str(parsed.model_dir) if parsed.model_dir else None,
        data_root=str(parsed.data_root) if parsed.data_root else None,
        output=str(parsed.output) if parsed.output else None,
        passes=parsed.passes,
        stride=parsed.stride,
        overlap=parsed.overlap,
        output_scale=parsed.output_scale,
        overwrite=parsed.overwrite,
        log_every=parsed.log_every,
        window_batch=parsed.window_batch,
        scan_unroll=parsed.scan_unroll,
        accum_mode=parsed.accum_mode,
        batch_events=parsed.batch_events,
        config_path=str(parsed.config),
    )


if __name__ == "__main__":
    main()
