"""Checkpoint save/load with real resume.

Format mirrors the reference's torch dict (reference ``scripts/train.py:475-485``):
``{epoch, global_step, generator, optimizer_g[, discriminator, optimizer_d]}``
serialized with flax msgpack. ``latest.ckpt`` is overwritten every epoch and
``best.ckpt`` on validation improvement (train.py:211-220); unlike the
reference (which has no --resume flag), ``load_checkpoint`` restores the full
optimizer state for exact resumption. Checkpoint resolution falls back
latest -> newest ``*.ckpt``/``*.msgpack`` (reference scripts/infer.py:61-80).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional

import flax.serialization as ser


def save_checkpoint(path: str | Path, payload: Dict[str, Any]) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = ser.to_bytes(payload)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    tmp.replace(path)


def load_checkpoint(path: str | Path, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the same pytree structure as ``template``."""
    return ser.from_bytes(template, Path(path).read_bytes())


def load_checkpoint_raw(path: str | Path) -> Dict[str, Any]:
    """Structure-free restore (nested dicts/lists of arrays)."""
    return ser.msgpack_restore(Path(path).read_bytes())


def resolve_checkpoint(save_dir: str | Path,
                       explicit: Optional[str | Path] = None) -> Path:
    if explicit:
        p = Path(explicit)
        if not p.exists():
            raise FileNotFoundError(p)
        return p
    base = Path(save_dir)
    if base.is_file():
        return base
    latest = base / "latest.ckpt"
    if latest.exists():
        return latest
    if base.exists():
        candidates = sorted(
            list(base.glob("*.ckpt")) + list(base.glob("*.msgpack")) + list(base.glob("*.pt")),
            key=lambda p: p.stat().st_mtime, reverse=True)
        if candidates:
            logging.warning("latest.ckpt not found, falling back to %s", candidates[0])
            return candidates[0]
    raise FileNotFoundError(f"Checkpoint not found under {base}")
