"""Experiment dispatcher: ``python -m experiments.main`` (reference main.py).

Loads observation/truth/prediction zarr stores and gauge masks, then runs the
enabled experiments (exp1 metrics, exp2 GIFs/PDF panels, exp3 NSE analysis).
"""

from __future__ import annotations

import argparse
import os

from .config import build_config, get_mode_config
from .exp1 import run_exp1
from .exp2 import run_exp2, run_exp2_paper_zarr
from .exp3 import run_exp3
from .io import ensure_dir, load_mask, load_zarr_array, save_config_snapshot, \
    save_json, save_text


def _crop_mask(mask, size):
    h, w = mask.shape
    top = (h - size) // 2
    left = (w - size) // 2
    return mask[top:top + size, left:left + size]


def _metrics_lines(metrics):
    lines = []
    for name, vals in metrics.items():
        lines.append(f"[{name}]")
        for k, v in vals.items():
            if isinstance(v, dict):
                lines.append(f"{k}:")
                for sk, sv in v.items():
                    lines.append(f"  {sk}: {sv:.6f}")
            else:
                lines.append(f"{k}: {v:.6f}")
        lines.append("")
    return lines


def main(config_path=None, data_root=None) -> None:
    cfg = build_config(config_path=config_path, data_root=data_root)
    mode_cfg = get_mode_config(cfg)

    results_root = os.path.join(cfg.save_dir, cfg.experiment_name)
    ensure_dir(results_root)
    save_config_snapshot(os.path.join(results_root, "config.json"), cfg)

    observation = load_zarr_array(mode_cfg.observation_path)
    truth = load_zarr_array(mode_cfg.truth_path, return_events=True)
    preds = {name: load_zarr_array(path, return_events=True)
             for name, path in mode_cfg.methods.items()}

    mask_train = _crop_mask(load_mask(mode_cfg.mask_train_path), cfg.crop_size)
    mask_test = _crop_mask(load_mask(mode_cfg.mask_test_path), cfg.crop_size)

    if cfg.run_exp1:
        exp1_dir = os.path.join(results_root, "exp1")
        ensure_dir(exp1_dir)
        mask_for_mode = mask_train if cfg.mode == "radar" else mask_test
        metrics = run_exp1(preds, truth, mask_for_mode, cfg.mode, cfg.crop_size,
                           use_pool8=cfg.exp1_pool8, divide_by_3=True)
        save_json(os.path.join(exp1_dir, "metrics.json"), metrics)
        save_text(os.path.join(exp1_dir, "metrics.txt"), _metrics_lines(metrics))

    if cfg.run_exp2_gif:
        exp2_gif_dir = os.path.join(results_root, "exp2_gif")
        ensure_dir(exp2_gif_dir)
        run_exp2(preds=mode_cfg.methods, truth=mode_cfg.truth_path,
                 observation=mode_cfg.observation_path, mask_train=mask_train,
                 out_dir=exp2_gif_dir, crop_size=cfg.crop_size, frames=None,
                 vmin=cfg.visualization_vmin, vmax=cfg.visualization_vmax,
                 gif_fps=cfg.gif_fps, divide_by_3=True, mode=cfg.mode)

    if cfg.run_exp2_pdf:
        exp2_pdf_dir = os.path.join(results_root, "exp2_pdf")
        ensure_dir(exp2_pdf_dir)
        mask_path = cfg.exp2_paper_mask_path or mode_cfg.mask_train_path
        run_exp2_paper_zarr(
            observation_path=mode_cfg.observation_path,
            methods=mode_cfg.methods,
            events=cfg.exp2_paper_events,
            mask_path=mask_path,
            crop_size=cfg.crop_size,
            out_dir=exp2_pdf_dir,
            output_pdf=cfg.exp2_paper_output_pdf,
            method_order=("RadarMasked", "Nimrod", *mode_cfg.methods.keys()),
            crop_pdf=False,
            crop_output=cfg.exp2_paper_crop_output,
        )

    if cfg.run_exp3:
        exp3_dir = os.path.join(results_root, "exp3")
        ensure_dir(exp3_dir)
        mask_for_mode = mask_train if cfg.mode == "radar" else mask_test
        metrics = run_exp3(preds, truth, mask_for_mode, cfg.mode, cfg.crop_size,
                           exp3_dir)
        save_json(os.path.join(exp3_dir, "metrics.json"), metrics)
        save_text(os.path.join(exp3_dir, "metrics.txt"),
                  [f"{k}: {v:.6f}" for k, v in metrics.items()])


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="P2I-GAN benchmark experiments")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--data-root", type=str, default=None)
    args = parser.parse_args()
    main(config_path=args.config, data_root=args.data_root)
