"""Data inspection script (reference ``experiments/test.py``): prints value
statistics over sampled pixels of the observation and prediction stores and
saves log-density histograms."""

from __future__ import annotations

import os

import numpy as np

from .config import build_config, get_mode_config
from .io import ensure_dir, load_zarr_array


def sample_values(arr: np.ndarray, n: int = 1_000_000,
                  seed: int = 0) -> np.ndarray:
    flat = np.asarray(arr).ravel()
    flat = flat[np.isfinite(flat)]
    if flat.size <= n:
        return flat
    idx = np.random.default_rng(seed).choice(flat.size, size=n, replace=False)
    return flat[idx]


def describe(name: str, values: np.ndarray) -> None:
    print(f"[{name}] n={values.size} min={values.min():.4f} max={values.max():.4f} "
          f"mean={values.mean():.4f} std={values.std():.4f}")


def plot_hist(values_map, out_path: str) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4), dpi=150)
    for name, values in values_map.items():
        ax.hist(values, bins=100, histtype="step", density=True, log=True, label=name)
    ax.set_xlabel("value")
    ax.set_ylabel("log density")
    ax.legend(fontsize=8)
    plt.tight_layout()
    plt.savefig(out_path)
    plt.close(fig)


def main() -> None:
    cfg = build_config()
    mode_cfg = get_mode_config(cfg)
    out_dir = os.path.join(cfg.save_dir, "data_inspection")
    ensure_dir(out_dir)

    values_map = {}
    obs = load_zarr_array(mode_cfg.observation_path)
    values_map["observation"] = sample_values(obs)
    describe("observation", values_map["observation"])
    for name, path in mode_cfg.methods.items():
        try:
            arr = load_zarr_array(path)
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] unavailable: {e}")
            continue
        values_map[name] = sample_values(arr)
        describe(name, values_map[name])
    plot_hist(values_map, os.path.join(out_dir, "value_histograms.png"))


if __name__ == "__main__":
    main()
