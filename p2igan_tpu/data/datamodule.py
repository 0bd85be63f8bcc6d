"""Data module: datasets + prefetching loaders per split.

Re-design of reference ``p2igan_bench/data/dataloader.py``:

* routing: ``data.train.data_root`` ending in ``train.zarr`` selects the
  sliding-window dataset with a seeded 80/20 train/val split
  (dataloader.py:89-110); otherwise per-split ``EventDataset``, where valid
  inherits train's w/h/sample_length/mask and test drops ``sample_length``
  (dataloader.py:43-54,150-153). Test batch size is fixed to 1
  (dataloader.py:71).
* loading: instead of torch DataLoader worker processes, a thread-pool
  prefetch loader producing numpy batches (B, T, H, W, C); per-item RNG is
  derived from (seed, epoch, index) so epochs are reproducible; variable
  length events are padded by repeating the last frame
  (dataloader.py:155-170).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config import build_dataset_args, drop_sample_length, extract_shared_params
from .stores import EventDataset, Item, ZarrWindowDataset


def pad_repeat_last(a: np.ndarray, length: int, axis: int = 0) -> np.ndarray:
    """Pad ``a`` along ``axis`` to ``length`` by repeating its last slice.

    The single definition of the repeat-last-frame time-padding semantics
    shared by the collate below and every sliding-window entry point in
    ``inference/driver.py`` (reference pads windows the same way,
    scripts/infer.py:223-227)."""
    n = length - a.shape[axis]
    if n <= 0:
        return a
    reps = np.repeat(np.take(a, [-1], axis=axis), n, axis=axis)
    return np.concatenate([a, reps], axis=axis)


def collate_pad_last(items: Sequence[Item]) -> Tuple[np.ndarray, ...]:
    """Stack items, padding shorter sequences by repeating the last frame.

    Items are (video, masked, mask) triples — or (video_u8, mask_u8) pairs in
    the raw device-decode pipeline. Each stream pads to its OWN max length:
    for the triples all streams share T (current behavior), while the raw
    pipeline's frame-constant sti/stis masks stay (1, H, W, 1) — the device
    decode broadcasts them, so the host never ships T copies."""
    out = []
    for stream in zip(*items):
        max_len = max(arr.shape[0] for arr in stream)
        out.append(np.stack([pad_repeat_last(arr, max_len)
                             for arr in stream]))
    return tuple(out)


class Subset:
    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None) -> Item:
        return self.dataset.__getitem__(self.indices[idx], rng=rng)


class Loader:
    """Thread-pool prefetching batch loader over an indexable dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool, seed: int = 0,
                 num_workers: int = 4, drop_last: bool = False,
                 prefetch_batches: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch_batches = prefetch_batches
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            return rng.permutation(n)
        return np.arange(n)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        order = self._order()
        epoch = self.epoch
        self.epoch += 1
        n = len(order)
        batches: List[np.ndarray] = [
            order[i:i + self.batch_size] for i in range(0, n, self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        def fetch(idx: int) -> Item:
            rng = np.random.default_rng((self.seed, epoch, int(idx)))
            return self.dataset.__getitem__(int(idx), rng=rng)

        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending: List[List[cf.Future]] = []
            bi = 0
            # prime the pipeline
            while bi < len(batches) and len(pending) <= self.prefetch_batches:
                pending.append([pool.submit(fetch, i) for i in batches[bi]])
                bi += 1
            while pending:
                futs = pending.pop(0)
                if bi < len(batches):
                    pending.append([pool.submit(fetch, i) for i in batches[bi]])
                    bi += 1
                yield collate_pad_last([f.result() for f in futs])


class P2IDataModule:
    """Builds train/val/test datasets and loaders from a config dict."""

    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        data_cfg = cfg["data"]
        train_opts = cfg.get("train", {})
        self.num_workers = train_opts.get("num_workers", 4)
        self.seed = cfg.get("seed", 42)

        self.train_args = build_dataset_args(data_cfg["train"])
        shared = extract_shared_params(self.train_args)

        self.train_dataset = None
        self.valid_dataset = None
        self.test_dataset = None
        self.valid_shuffle = False
        self.test_shuffle = False

        if str(self.train_args.get("data_root", "")).endswith("train.zarr"):
            base = ZarrWindowDataset(self.train_args)
            self.train_dataset, self.valid_dataset = self._split_train_valid(
                base, seed=self.seed)
        else:
            self.train_dataset = EventDataset(self.train_args)
            valid_cfg = data_cfg.get("valid")
            if valid_cfg:
                valid_args = build_dataset_args(valid_cfg, defaults=shared)
                self.valid_shuffle = bool(valid_cfg.get("shuffle", False))
                self.valid_dataset = EventDataset(valid_args)

        test_cfg = data_cfg.get("test")
        if test_cfg:
            test_args = build_dataset_args(test_cfg, defaults=drop_sample_length(shared))
            self.test_shuffle = bool(test_cfg.get("shuffle", False))
            self.test_dataset = EventDataset(test_args)

    @staticmethod
    def _split_train_valid(dataset, seed: int = 42, train_ratio: float = 0.8):
        """Seeded random 80/20 split (reference dataloader.py:94-110)."""
        total = len(dataset)
        if total <= 1:
            return dataset, None
        val_size = int(total * (1 - train_ratio))
        val_size = min(max(val_size, 1), total - 1)
        train_size = total - val_size
        indices = np.random.default_rng(seed).permutation(total).tolist()
        return (Subset(dataset, indices[:train_size]),
                Subset(dataset, indices[train_size:]))

    def train_dataloader(self) -> Optional[Loader]:
        if self.train_dataset is None:
            return None
        return Loader(self.train_dataset, self.cfg["train"]["batch_size"],
                      shuffle=True, seed=self.seed, num_workers=self.num_workers)

    def val_dataloader(self) -> Optional[Loader]:
        if self.valid_dataset is None:
            return None
        return Loader(self.valid_dataset, self.cfg["train"]["batch_size"],
                      shuffle=self.valid_shuffle, seed=self.seed + 1,
                      num_workers=self.num_workers)

    def test_dataloader(self) -> Optional[Loader]:
        if self.test_dataset is None:
            return None
        return Loader(self.test_dataset, 1, shuffle=self.test_shuffle,
                      seed=self.seed + 2, num_workers=self.num_workers)
