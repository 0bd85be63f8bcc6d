"""PyTorch checkpoint importer: reference state_dicts -> flax variables.

Maps the reference's torch ``state_dict`` layouts (reference
``scripts/train.py:475-485`` checkpoint format; released artifact
``weights/test/P2IGANv0.1.0.pt``) onto this framework's parameter pytrees:

* DOConv ``W (out, in/g, D_mul)`` / ``D`` keep their factored shapes
  (``D_diag`` buffers are synthesized constants and skipped)
* plain conv ``weight (O, I, kh, kw)`` -> HWIO; Conv1d (O, I, k) -> (k, I, O);
  Conv3d (O, I, kt, kh, kw) -> DHWIO; ConvTranspose3d (I, O, k...) ->
  (k..., O, I)
* spectral-norm convs: ``weight_orig`` -> kernel, ``weight_u``/``weight_v``
  -> the ``spectral`` collection
* ``UPPos.pos (1, 1, H, W)`` -> (1, H, W, 1); Linear ``weight (out, in)`` ->
  transposed ``fc*``; BatchNorm weight/bias/running stats -> scale/bias/
  batch_stats

Import is strictly accounted: every torch key must be consumed and every
flax leaf filled, else it raises.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str | Path) -> Dict[str, np.ndarray]:
    """Read a .pt checkpoint to {name: ndarray}; unwraps the trainer dict."""
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=True)
    state = ckpt["generator"] if isinstance(ckpt, dict) and "generator" in ckpt else ckpt
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


class _Importer:
    def __init__(self, state: Dict[str, np.ndarray]):
        self.state = dict(state)
        self.params: Dict[str, Any] = {}
        self.extra: Dict[str, Dict[str, Any]] = {}

    def take(self, key: str) -> np.ndarray:
        if key not in self.state:
            raise KeyError(f"missing torch key: {key}")
        return self.state.pop(key)

    def maybe_take(self, key: str):
        return self.state.pop(key, None)

    def set(self, path: Tuple[str, ...], value: np.ndarray,
            collection: str = "params") -> None:
        node = self.params if collection == "params" else \
            self.extra.setdefault(collection, {})
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def finish(self, ignore_suffixes=("D_diag", "num_batches_tracked")) -> None:
        leftovers = [k for k in self.state
                     if not any(k.endswith(sfx) for sfx in ignore_suffixes)]
        if leftovers:
            raise ValueError(f"unconsumed torch keys: {leftovers}")

    def variables(self) -> Dict[str, Any]:
        """finish() + assemble the flax variables dict."""
        self.finish()
        out: Dict[str, Any] = {"params": self.params}
        out.update(self.extra)
        return out

    # -- common layer mappings ----------------------------------------
    def doconv(self, tprefix: str, fpath: Tuple[str, ...], kernel_size: int) -> None:
        W = self.take(f"{tprefix}.W")
        if kernel_size > 1:
            self.set(fpath + ("W",), W)
            self.set(fpath + ("D",), self.take(f"{tprefix}.D"))
        else:
            # 1x1 DO-conv degenerates to a plain conv; store HWIO
            out_ch, in_per_g, _ = W.shape
            self.set(fpath + ("W",),
                     np.transpose(W.reshape(out_ch, in_per_g, 1, 1), (2, 3, 1, 0)))
        b = self.maybe_take(f"{tprefix}.bias")
        if b is not None:
            self.set(fpath + ("bias",), b)

    def conv2d(self, tprefix: str, fpath: Tuple[str, ...]) -> None:
        w = self.take(f"{tprefix}.weight")
        self.set(fpath + ("kernel",), np.transpose(w, (2, 3, 1, 0)))
        b = self.maybe_take(f"{tprefix}.bias")
        if b is not None:
            self.set(fpath + ("bias",), b)

    def conv1d(self, tprefix: str, fpath: Tuple[str, ...]) -> None:
        w = self.take(f"{tprefix}.weight")  # (O, I, k)
        self.set(fpath + ("kernel",), np.transpose(w, (2, 1, 0)))
        b = self.maybe_take(f"{tprefix}.bias")
        if b is not None:
            self.set(fpath + ("bias",), b)

    def snconv(self, tprefix: str, fname: str, ndim: int) -> None:
        w = self.take(f"{tprefix}.weight_orig")
        perm = tuple(range(2, 2 + ndim)) + (1, 0)  # OI(spatial) -> (spatial)IO
        self.set((fname, "kernel"), np.transpose(w, perm))
        b = self.maybe_take(f"{tprefix}.bias")
        if b is not None:
            self.set((fname, "bias"), b)
        self.set((fname, "u"), self.take(f"{tprefix}.weight_u"), "spectral")
        self.set((fname, "v"), self.take(f"{tprefix}.weight_v"), "spectral")

    def linear(self, tprefix: str, fpath_w: Tuple[str, ...],
               fpath_b: Tuple[str, ...]) -> None:
        self.set(fpath_w, self.take(f"{tprefix}.weight").T)
        self.set(fpath_b, self.take(f"{tprefix}.bias")[None, :])


def import_p2igan_generator(state: Dict[str, np.ndarray],
                            num_res: int = 4) -> Dict[str, Any]:
    """Reference P2IGenerator state_dict -> flax variables."""
    imp = _Importer(state)
    # InputBlock attention stack (layer.py:307-314): input.layers.{i}.conv
    depth = len({k.split(".")[2] for k in state if k.startswith("input.layers.")})
    for i in range(depth):
        imp.conv1d(f"input.layers.{i}.conv", ("input", f"att{i}"))
    # Convsin / ConvsOut: BasicConv_do -> main.0 is the DOConv
    imp.doconv("Convsin.0.main.0", ("Convsin_0", "conv"), kernel_size=3)
    imp.doconv("ConvsOut.0.main.0", ("ConvsOut_0", "conv"), kernel_size=1)
    # Decoder EBlocks: Decoder.{k}.layers.{i}.main.{j}.main.0
    for k in range(4):
        for i in range(num_res):
            for j in (0, 1):
                imp.doconv(f"Decoder.{k}.layers.{i}.main.{j}.main.0",
                           (f"Decoder_{k}", f"res{i}", f"conv{j + 1}", "conv"),
                           kernel_size=3)
    # UPPos
    for k in range(3):
        pos = imp.take(f"UP.{k}.pos")  # (1, 1, H, W)
        imp.set((f"UP_{k}", "pos"), np.transpose(pos, (0, 2, 3, 1)))
        imp.conv2d(f"UP.{k}.proj", (f"UP_{k}", "proj"))
    return imp.variables()


def import_p2igan_discriminator(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    imp = _Importer(state)
    for idx in (0, 2, 4, 6, 8):
        imp.snconv(f"d2d.{idx}", f"d2d_{idx}", ndim=2)
        imp.snconv(f"d3d.{idx}", f"d3d_{idx}", ndim=3)
    imp.set(("alpha2d",), imp.take("alpha2d"))
    imp.set(("alpha3d",), imp.take("alpha3d"))
    return imp.variables()


def import_dk_generator(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """DK / STDK: shared MLP Linear stack (_mlp.net.{0,2,4,6})."""
    imp = _Importer(state)
    for tidx, fname in ((0, "fc1"), (2, "fc2"), (4, "fc3"), (6, "fc4")):
        imp.linear(f"_mlp.net.{tidx}", ("mlp", fname),
                   ("mlp", f"b{fname[-1]}"))
    imp.finish()
    return {"params": imp.params}


import_stdk_generator = import_dk_generator


def visible_topk_order(mask_flat: np.ndarray, k: int = 79) -> np.ndarray:
    """torch's unsorted top-k index order for one flat 0/1 mask row.

    The reference gathers its k visible gauge values with
    ``torch.topk(mask, k, sorted=False)`` (dk.py:167-170, stdk.py:173-175),
    whose tie order among the mask's 1s is implementation-defined (introselect
    on CPU; different again on CUDA). A trained DK/STDK checkpoint is
    therefore tied to the permutation of the device it trained on. This
    framework uses ascending pixel index (``models/dk.py select_visible``);
    use :func:`remap_dk_visible_columns` to convert a checkpoint whose
    training-time order is known/reproducible.
    """
    import torch

    _, idx = torch.topk(torch.from_numpy(np.asarray(mask_flat, np.float32)),
                        k=k, largest=True, sorted=False)
    return idx.numpy()


def remap_dk_visible_columns(variables: Dict[str, Any], order: np.ndarray,
                             n_space: int, n_time: int = 0,
                             t_blocks: int = 1) -> Dict[str, Any]:
    """Permute the MLP fc1 rows of the visible-value block(s) from a torch
    top-k ``order`` to this framework's ascending-index order.

    Feature layout (reference dk.py:191-194 / stdk.py:180-185):
    ``[phi_s (n_space) | phi_t (n_time) | z (t_blocks * k)]``.
    """
    k = len(order)
    asc = np.sort(order)
    pos = {int(g): j for j, g in enumerate(order)}
    perm = np.array([pos[int(g)] for g in asc])

    out = {"params": {"mlp": dict(variables["params"]["mlp"])}}
    fc1 = np.array(out["params"]["mlp"]["fc1"])  # (feature_dim, hidden)
    base = n_space + n_time
    if base + t_blocks * k != fc1.shape[0]:
        raise ValueError(
            f"visible-column remap layout mismatch: n_space+n_time={base} "
            f"plus {t_blocks} block(s) of {k} gauges != fc1 rows "
            f"{fc1.shape[0]}; a wrong offset would silently permute the "
            f"wrong rows")
    for b in range(t_blocks):
        off = base + b * k
        fc1[off:off + k] = fc1[off:off + k][perm]
    out["params"]["mlp"]["fc1"] = fc1
    return out


def import_simple_generator(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    imp = _Importer(state)

    def conv3d_block(tprefix: str, fname: str) -> None:
        w = imp.take(f"{tprefix}.0.weight")  # (O, I, kt, kh, kw)
        imp.set((fname, "kernel"), np.transpose(w, (2, 3, 4, 1, 0)))
        imp.set((fname, "bias"), imp.take(f"{tprefix}.0.bias"))
        imp.set((fname, "bn", "scale"), imp.take(f"{tprefix}.1.weight"))
        imp.set((fname, "bn", "bias"), imp.take(f"{tprefix}.1.bias"))
        imp.set((fname, "bn", "mean"), imp.take(f"{tprefix}.1.running_mean"),
                "batch_stats")
        imp.set((fname, "bn", "var"), imp.take(f"{tprefix}.1.running_var"),
                "batch_stats")

    for i in range(3):
        conv3d_block(f"encoder.{i}", f"enc{i}")
    for tidx, fname in ((0, "dec0"), (2, "dec1")):
        w = imp.take(f"decoder.{tidx}.weight")  # ConvTranspose3d (I, O, k...)
        imp.set((f"{fname}_kernel",), np.transpose(w, (2, 3, 4, 1, 0)))
        imp.set((f"{fname}_bias",), imp.take(f"decoder.{tidx}.bias"))
    w = imp.take("decoder.4.weight")
    imp.set(("dec2_kernel",), np.transpose(w, (2, 3, 4, 1, 0)))
    imp.set(("dec2_bias",), imp.take("decoder.4.bias"))
    return imp.variables()


_GENERATOR_IMPORTERS = {
    "p2igan": import_p2igan_generator,
    "dk": import_dk_generator,
    "stdk": import_stdk_generator,
    "simple": import_simple_generator,
}


def load_torch_checkpoint(path: str | Path,
                          model_name: str = "p2igan") -> Dict[str, Any]:
    """Load a reference .pt generator checkpoint into flax variables."""
    state = load_torch_state_dict(path)
    name = model_name.lower()
    if name not in _GENERATOR_IMPORTERS:
        raise ValueError(f"no torch importer for model {model_name!r}")
    return _GENERATOR_IMPORTERS[name](state)
