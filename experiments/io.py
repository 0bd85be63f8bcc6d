"""Offline-eval I/O helpers (capability parity with reference ``experiments/io.py``).

Array plumbing for the evaluation suite: shape normalization, center
cropping, gauge-mask loading, zarr store loading (via the self-contained
``zarrlite`` backend — no ``zarr``/``xarray`` dependency), masked pixel
selection, and run-artifact writers.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, is_dataclass
from typing import Dict, Iterable, Optional, Tuple, Union

import numpy as np

from p2igan_tpu.data import zarrlite

ArrayOrEvents = Union[np.ndarray, Dict[str, np.ndarray]]


def ensure_thw(arr: np.ndarray) -> np.ndarray:
    """Normalize any of the pipeline's array layouts to (T, H, W).

    Accepts (T,H,W), a leading singleton batch (1,T,C,H,W), a singleton
    channel in torch position (T,1,H,W) or channel-last position (T,H,W,1),
    squeezing in that order until three dims remain.
    """
    squeeze_order = (
        lambda a: a[0] if a.ndim == 5 and a.shape[0] == 1 else a,
        lambda a: a[:, 0] if a.ndim == 4 and a.shape[1] == 1 else a,
        lambda a: a[..., 0] if a.ndim == 4 and a.shape[-1] == 1 else a,
    )
    for fn in squeeze_order:
        arr = fn(arr)
    if arr.ndim != 3:
        raise ValueError(f"Expected [T,H,W], got shape {arr.shape}")
    return arr


def crop_center(arr: np.ndarray, size: int) -> np.ndarray:
    """Center-crop the spatial dims of a (T, H, W)-normalizable array."""
    arr = ensure_thw(arr)
    _, h, w = arr.shape
    if size > min(h, w):
        raise ValueError(f"crop size {size} exceeds input {h}x{w}")
    y0, x0 = (h - size) // 2, (w - size) // 2
    return arr[:, y0:y0 + size, x0:x0 + size]


def center_square(plane: np.ndarray, size: int) -> np.ndarray:
    """Center-crop a 2D (H, W) plane (gauge masks) to (size, size)."""
    h, w = plane.shape
    if size > min(h, w):
        raise ValueError(
            f"crop size {size} exceeds the ({h}, {w}) mask plane")
    y0, x0 = (h - size) // 2, (w - size) // 2
    return plane[y0:y0 + size, x0:x0 + size]


def load_mask(path: str) -> np.ndarray:
    """Whitespace txt gauge mask -> (H, W) bool."""
    return np.loadtxt(path).astype(bool)


def load_zarr_array(path: str, key: Optional[str] = None,
                    return_events: bool = False) -> ArrayOrEvents:
    """Load a zarr store.

    ``return_events=True`` yields a per-event dict keyed by the store's
    groups (or arrays); otherwise the named array (or the first one) is
    returned as a single ndarray.
    """
    store = zarrlite.open(path, mode="r")
    if isinstance(store, zarrlite.Array):
        return np.asarray(store)
    if return_events:

        def node_array(name):
            node = store[name]
            if isinstance(node, zarrlite.Array):
                return np.asarray(node)
            # event GROUPS (e.g. events/<ts>/frames layouts) hold their
            # frames in a child array; np.asarray(Group) would produce a
            # useless 0-d object array
            inner = node.array_keys()
            if not inner:
                raise ValueError(
                    f"event group {name!r} in {path} contains no array")
            pick = "frames" if "frames" in inner else inner[0]
            return np.asarray(node[pick])

        keys = store.group_keys() or store.array_keys()
        if keys:
            return {name: node_array(name) for name in keys}
    if key is not None:
        return np.asarray(store[key])
    arrays = store.array_keys()
    if not arrays:
        raise ValueError(f"No arrays found in {path}")
    return np.asarray(store[arrays[0]])


def align_length(a: np.ndarray, b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Truncate both sequences to the shorter one's frame count."""
    a, b = ensure_thw(a), ensure_thw(b)
    n = min(len(a), len(b))
    return a[:n], b[:n]


def select_by_mask(arr: np.ndarray, mask: np.ndarray,
                   invert: bool = False) -> np.ndarray:
    """Per-frame pixel selection: (T, H, W) + (H, W) mask -> (T, n_selected).

    ``invert=True`` selects the held-out (unobserved) pixels — the radar
    evaluation mode; ``invert=False`` selects gauge pixels.
    """
    arr = ensure_thw(arr)
    sel = np.asarray(mask, dtype=bool)
    if sel.shape != arr.shape[1:]:
        raise ValueError(f"Mask shape {sel.shape} != data shape {arr.shape[1:]}")
    sel = ~sel if invert else sel
    return arr[:, sel]


def mask_for_input(arr: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Zero out the masked pixels of every frame (returns a copy)."""
    arr = ensure_thw(arr).copy()
    sel = np.asarray(mask, dtype=bool)
    if sel.shape != arr.shape[1:]:
        raise ValueError(f"Mask shape {sel.shape} != data shape {arr.shape[1:]}")
    arr[:, sel] = 0.0
    return arr


# -- run-artifact writers ---------------------------------------------------


def ensure_dir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def save_json(path: str, payload: Dict) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(payload, f, indent=2, sort_keys=True)


def save_text(path: str, lines: Iterable[str]) -> None:
    body = "\n".join(line.rstrip() for line in lines)
    with open(path, "w", encoding="utf-8") as f:
        f.write(body + ("\n" if body else ""))


def save_config_snapshot(path: str, cfg) -> None:
    """Persist the experiment config (dataclass / object / dict) as JSON."""
    if is_dataclass(cfg):
        payload = asdict(cfg)
    else:
        payload = getattr(cfg, "__dict__", cfg)
    save_json(path, payload)
