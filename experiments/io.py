"""Offline-eval I/O helpers (re-design of reference ``experiments/io.py``)."""

from __future__ import annotations

import json
import os
from dataclasses import asdict, is_dataclass
from typing import Dict, Iterable, Optional, Tuple, Union

import numpy as np

from p2igan_tpu.data import zarrlite


def ensure_thw(arr: np.ndarray) -> np.ndarray:
    """Squeeze (1,T,C,H,W)/(T,1,H,W)/(T,H,W,1) variants down to (T,H,W)."""
    if arr.ndim == 5 and arr.shape[0] == 1:
        arr = arr[0]
    if arr.ndim == 4 and arr.shape[1] == 1:
        arr = arr[:, 0]
    if arr.ndim == 4 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    if arr.ndim != 3:
        raise ValueError(f"Expected [T,H,W], got shape {arr.shape}")
    return arr


def crop_center(arr: np.ndarray, size: int) -> np.ndarray:
    arr = ensure_thw(arr)
    t, h, w = arr.shape
    if size > min(h, w):
        raise ValueError(f"crop size {size} exceeds input {h}x{w}")
    top = (h - size) // 2
    left = (w - size) // 2
    return arr[:, top:top + size, left:left + size]


def load_mask(path: str) -> np.ndarray:
    return np.loadtxt(path).astype(bool)


def load_zarr_array(path: str, key: Optional[str] = None,
                    return_events: bool = False) -> Union[np.ndarray, Dict[str, np.ndarray]]:
    """Load a zarr store: per-event dict (groups or arrays) or a flat array."""
    z = zarrlite.open(path, mode="r")
    if return_events:
        if isinstance(z, zarrlite.Group):
            keys = z.group_keys() or z.array_keys()
            if keys:
                return {k: np.asarray(z[k]) for k in keys}
    if isinstance(z, zarrlite.Group):
        keys = z.array_keys()
        if key is not None:
            return np.asarray(z[key])
        if keys:
            return np.asarray(z[keys[0]])
        raise ValueError(f"No arrays found in {path}")
    return np.asarray(z)


def align_length(a: np.ndarray, b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    a = ensure_thw(a)
    b = ensure_thw(b)
    n = min(a.shape[0], b.shape[0])
    return a[:n], b[:n]


def select_by_mask(arr: np.ndarray, mask: np.ndarray, invert: bool = False) -> np.ndarray:
    """Flatten pixels at (optionally inverted) mask locations -> (T, n_sel)."""
    arr = ensure_thw(arr)
    mask = mask.astype(bool)
    if mask.shape != arr.shape[1:]:
        raise ValueError(f"Mask shape {mask.shape} != data shape {arr.shape[1:]}")
    if invert:
        mask = ~mask
    return arr.reshape(arr.shape[0], -1)[:, mask.ravel()]


def mask_for_input(arr: np.ndarray, mask: np.ndarray) -> np.ndarray:
    arr = ensure_thw(arr)
    mask = mask.astype(bool)
    if mask.shape != arr.shape[1:]:
        raise ValueError(f"Mask shape {mask.shape} != data shape {arr.shape[1:]}")
    out = arr.copy()
    out[:, mask] = 0.0
    return out


def save_json(path: str, payload: Dict) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(payload, f, indent=2, sort_keys=True)


def ensure_dir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def save_config_snapshot(path: str, cfg) -> None:
    if is_dataclass(cfg):
        payload = asdict(cfg)
    elif hasattr(cfg, "__dict__"):
        payload = cfg.__dict__
    else:
        payload = cfg
    save_json(path, payload)


def save_text(path: str, lines: Iterable[str]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for line in lines:
            f.write(line.rstrip() + "\n")
