"""Training orchestration (L5), the reference ``Trainer`` re-designed.

Owns: data module, generator/discriminator, optax Adam optimizers,
reconstruction loss, tracker run, checkpointing — reference
``scripts/train.py:98-225``. Differences by design:

* the per-batch python loop shrinks to one jitted ``train_step`` call; host
  work is only batch prefetch + metric logging
* batches are sharded over the device mesh ``data`` axis (reference is
  single-device); the train loader drops ragged final batches so shapes stay
  static
* ``val_loss`` is initialized to +inf so disabling validation does not crash
  (the reference has an unbound-variable crash path, train.py:206-215 —
  deliberate fix, documented here)
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import flatten_dict
from ..data.datamodule import P2IDataModule
from ..models import build_discriminator, build_generator
from ..parallel.mesh import batch_sharding, create_mesh, replicated_sharding
from ..utils.tracking import get_tracker
from .checkpoint import load_checkpoint_raw, save_checkpoint
from .steps import TrainState, build_eval_step, build_predict_fn, build_train_step, make_optimizer


def _migrate_opt_state(template, data):
    """Drop stale ``mu`` entries when restoring pre-round-4 checkpoints.

    Checkpoints written before the b1==0 fast path stored optax's full
    ``ScaleByAdamState(count, mu, nu)``; the current template for those
    configs is ``_AdamNoMuState(count, nu)``. At ``b1 == 0`` the first
    moment is identically the last gradient (``mu = (1-b1)*g = g``) and
    carries no optimizer information, so it is safe to discard. Walks the
    serialized dict guided by the live template so only genuine
    ScaleByAdamState->_AdamNoMuState sites are migrated.
    """
    from .steps import _AdamNoMuState

    if isinstance(template, _AdamNoMuState):
        if isinstance(data, dict) and "mu" in data:
            return {k: v for k, v in data.items() if k != "mu"}
        return data
    if isinstance(data, dict):
        if isinstance(template, (tuple, list)):
            return {k: (_migrate_opt_state(template[int(k)], v)
                        if k.isdigit() and int(k) < len(template) else v)
                    for k, v in data.items()}
        if isinstance(template, dict):
            return {k: _migrate_opt_state(template.get(k), v)
                    for k, v in data.items()}
        if hasattr(template, "__dataclass_fields__"):
            return {k: _migrate_opt_state(getattr(template, k, None), v)
                    for k, v in data.items()}
    return data


class Trainer:
    def __init__(self, cfg: Dict[str, Any], mesh=None):
        self.cfg = cfg
        self.seed = cfg.get("seed", 42)
        self.mesh = mesh if mesh is not None else create_mesh()
        n_dev = int(np.prod(self.mesh.devices.shape))
        logging.info("Mesh: %d device(s) on axes %s", n_dev, self.mesh.axis_names)

        logging.info("Initializing data module...")
        self.data_module = P2IDataModule(cfg)
        self.train_loader = self.data_module.train_dataloader()
        self.val_loader = self.data_module.val_dataloader()
        self.test_loader = self.data_module.test_dataloader()
        self.n_data_shards = int(self.mesh.shape.get("data", 1))
        if self.train_loader is not None and self.n_data_shards > 1:
            self.train_loader.drop_last = True
        train_cfg = cfg.get("train", {})
        self.run_validation = bool(train_cfg.get("use_validation", True))
        # reference parity: train.py:111 parses use_test / --run-test but
        # never consumes them — the test split is evaluated offline via
        # scripts/infer.py + experiments.main, not inside the trainer
        self.run_test = bool(train_cfg.get("use_test", True))
        logging.info(
            "Data loaders ready | train=%s, val=%s, test=%s",
            len(self.train_loader) if self.train_loader else 0,
            len(self.val_loader) if self.val_loader else 0,
            len(self.test_loader) if self.test_loader else 0,
        )
        self.train_steps_per_epoch = max(1, len(self.train_loader) if self.train_loader else 1)

        logging.info("Building models...")
        self.use_gan = bool(cfg["loss"].get("use_gan", 0))
        self.generator = build_generator(cfg)
        self.discriminator = build_discriminator(cfg) if self.use_gan else None
        self._check_window_length()

        opt_cfg = cfg["train"]["optimizer"]
        self.opt_g = make_optimizer(opt_cfg)
        self.opt_d = make_optimizer(opt_cfg) if self.discriminator is not None else None

        self.k1_alpha = cfg["loss"].get("k1_weight", 0.0)
        self.gan_loss_type = cfg["loss"].get("gan_loss", "hinge")

        self.save_dir = Path(cfg.get("save_dir", "weights"))
        self.save_dir.mkdir(parents=True, exist_ok=True)

        self.log_every = int(train_cfg.get("log_step", 100))
        self.global_step = 0
        self.start_epoch = 0
        # `iterations: 0` means unset, like the falsy check deriving
        # max_epochs below (a literal 0 cap previously stopped after ONE
        # step because only the `is None` branch guarded it)
        self.max_steps = train_cfg.get("iterations") or None
        self.max_epochs = train_cfg.get("max_epochs")
        if self.max_epochs is None:
            loader_len = self.train_steps_per_epoch
            if self.max_steps:
                self.max_epochs = -(-int(self.max_steps) // loader_len)
            else:
                self.max_epochs = train_cfg.get("niter", 1)
        if self.max_steps is None:
            self.max_steps = self.max_epochs * self.train_steps_per_epoch

        self.best_val = float("inf")
        self.state = self._init_state()
        self._step_kwargs = dict(
            use_gan=self.use_gan, gan_loss_type=self.gan_loss_type,
            adversarial_weight=cfg["loss"].get("adversarial_weight", 0.01),
            k1_alpha=self.k1_alpha,
            gan_real_label=cfg["loss"].get("target_real_label", 1.0),
            gan_fake_label=cfg["loss"].get("target_fake_label", 0.0),
            # one concatenated fake+real D forward (see steps.py); set false
            # to restore the reference's exact two-forward SN cadence
            fused_disc_forward=bool(train_cfg.get("fused_disc_forward", True)),
        )
        self._build_steps()
        # stis gauge masks come from ONE fixed file, so the factored IDW's
        # gauge selection is a constant of the run; hoist it out of the
        # compiled train/eval programs from the first batch's concrete mask
        # (serving already hoists — inference/driver.py). Gated on the
        # config mask type because sti's shared-mask path only shares
        # WITHIN a batch, not across batches.
        train_mask_cfg = (cfg.get("data", {}).get("train", {})
                          .get("mask", {}) or {})
        self._idw_hoist_pending = (
            train_mask_cfg.get("type") == "stis"
            and getattr(self.generator, "idw_factored", False)
            and getattr(self.generator, "idw_shared_batch_mask", False)
            and hasattr(self.generator, "prepare_idw"))
        self.tracker = get_tracker()
        viz_cfg = cfg.get("viz", {})
        self.viz_scale = str(viz_cfg.get("scale", "gt_pred")).lower()
        self.viz_vmin = viz_cfg.get("vmin")
        self.viz_vmax = viz_cfg.get("vmax")
        # profiling: capture a jax.profiler trace for a step range
        # (the TPU answer to the reference's CUDA memory logging,
        # train.py:176-183)
        self.profile_dir = train_cfg.get("profile_dir")
        self.profile_start = int(train_cfg.get("profile_start_step", 2))
        self.profile_steps = int(train_cfg.get("profile_steps", 3))
        self._profiling = False
        self._profile_done = False  # >= trigger must fire once, incl. after
        self._profile_stop_at = 0   # a resume that lands past start_step
        self._decode_fn = None

    # ------------------------------------------------------------------
    def _build_steps(self, idw_prepared=None) -> None:
        self.train_step = build_train_step(
            self.generator, self.discriminator, self.opt_g, self.opt_d,
            idw_prepared=idw_prepared, **self._step_kwargs)
        self.eval_step = build_eval_step(self.generator,
                                         k1_alpha=self.k1_alpha,
                                         idw_prepared=idw_prepared)
        self.predict_fn = build_predict_fn(self.generator,
                                           idw_prepared=idw_prepared)

    def _maybe_hoist_idw(self, masks) -> None:
        """Hoist the mask-constant stis gauge selection out of the compiled
        steps (VERDICT r2 item 3): the per-step gauge top-k (~2.2 ms of a
        58 ms GAN step, PROFILE.md) and its backward leave the autodiff
        graph. Runs once, before the first compile, from the first batch's
        CONCRETE mask; masks that vary across the batch/frames fall back to
        the in-step selection (still exact). Hoisted == inline is asserted
        by tests/test_training.py::test_idw_hoisted_step_matches_inline."""
        self._idw_hoist_pending = False
        m = np.asarray(jax.device_get(masks))
        if not (m[:1, :1] == m).all():
            logging.warning("stis masks vary within the first batch; keeping "
                            "the in-step gauge selection")
            return
        prep = self.generator.prepare_idw(jnp.asarray(m[0, 0, :, :, 0]))
        prep = jax.device_get(prep)  # host constants: baked into the programs
        self._build_steps(idw_prepared=jax.tree_util.tree_map(jnp.asarray, prep))
        logging.info("Hoisted stis gauge selection out of the train step "
                     "(computed once from the run's fixed gauge mask)")

    # ------------------------------------------------------------------
    def _check_window_length(self) -> None:
        """Fail fast with a NAMED error when the train zarr's window length
        cannot feed a fixed-length generator. Both this framework and the
        reference read the index row's length regardless of sample_length
        (sti_dataset.py:286-307); a mismatch otherwise surfaces as an
        obscure parameter-shape error deep inside the model."""
        model_len = getattr(self.generator, "length", None)
        if not model_len or self.train_loader is None:
            return
        ds = self.train_loader.dataset
        ds = getattr(ds, "dataset", ds)  # unwrap the split Subset
        index = getattr(ds, "index_arr", None)
        if index is None:
            return
        lengths = set(int(v) for v in np.unique(index[:, 2]))
        if lengths - {int(model_len)}:
            raise ValueError(
                f"train zarr windows have length(s) {sorted(lengths)} but the "
                f"'{self.cfg.get('model', {}).get('name')}' generator expects "
                f"sample_length={model_len}; rebuild the train store with a "
                f"matching window (scripts/preprocess.py) or set "
                f"data.train.sample_length to the store's window length.")

    # ------------------------------------------------------------------
    def _example_batch(self):
        data_cfg = self.cfg["data"]["train"]
        t = data_cfg.get("sample_length", 16) or 16
        h, w = data_cfg["h"], data_cfg["w"]
        c = self.cfg.get("model", {}).get("in_channels", 1)
        b = max(1, self.cfg["train"].get("batch_size", 1))
        shape = (b, t, h, w, c)
        zeros = jnp.zeros(shape, jnp.float32)
        mask = jnp.zeros(shape, jnp.float32).at[:, :, ::4, ::4, :].set(1.0)
        return zeros, mask

    def _init_state(self) -> TrainState:
        masked, masks = self._example_batch()
        key = jax.random.key(self.seed)
        gen_vars = dict(self.generator.init(key, masked, masks))
        gen_params = gen_vars.pop("params")
        gen_extra = gen_vars
        opt_g_state = self.opt_g.init(gen_params)

        disc_params = disc_extra = opt_d_state = None
        if self.discriminator is not None:
            disc_vars = dict(self.discriminator.init(jax.random.key(self.seed + 1), masked))
            disc_params = disc_vars.pop("params")
            disc_extra = disc_vars
            opt_d_state = self.opt_d.init(disc_params)

        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params, gen_extra=gen_extra, opt_g=opt_g_state,
            disc_params=disc_params, disc_extra=disc_extra, opt_d=opt_d_state,
        )
        # replicate across the mesh
        repl = replicated_sharding(self.mesh)
        return jax.device_put(state, repl)

    def _put_batch(self, batch):
        sh = batch_sharding(self.mesh)
        # divisibility by the DATA axis, not the total device count: on a
        # dp x tp mesh a batch divisible by dp still shards over data
        if batch[0].shape[0] % self.n_data_shards != 0:
            sh = replicated_sharding(self.mesh)
        # np.asarray (not jnp): jnp would first commit the batch to device 0
        # and device_put would then RE-transfer it into the sharded layout
        put = lambda x: jax.device_put(np.asarray(x), sh)  # noqa: E731
        if len(batch) == 2:
            # raw device-decode pipeline: (uint8 video, uint8 mask) transfers
            # 4x fewer bytes; the fused decode+normalize+mask runs on device
            if self._decode_fn is None:
                from ..ops.pallas.decode_mask import decode_normalize_mask

                def _decode(u8, mask_u8):
                    # kernel widens the u8 mask in VMEM (frame-constant
                    # sti/stis masks arrive as (B,1,H,W,1) and broadcast via
                    # the block index map); the mask stays THIN here — the
                    # step jit broadcasts it (steps._gen_apply_factory), so
                    # no (B,T,H,W,1) f32 mask crosses the jit boundary
                    video, masked = decode_normalize_mask(u8, mask_u8)
                    return video, masked, mask_u8.astype(jnp.float32)

                self._decode_fn = jax.jit(_decode)
            return self._decode_fn(put(batch[0]), put(batch[1]))
        frames, masked, masks = batch
        return put(frames), put(masked), put(masks)

    def _device_prefetch(self, loader, lookahead: int = 2):
        """Double-buffer host->device transfers: a worker thread device_puts
        up to ``lookahead`` batches ahead while the chip computes the current
        step (the reference relies on pinned-memory non_blocking copies,
        train.py:468-473; here the queue bounds in-flight HBM)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=max(1, lookahead))
        _END = object()
        stop = threading.Event()

        def _put(item) -> bool:
            # Bounded put that gives up when the consumer is gone (e.g. the
            # epoch loop broke at max_steps): otherwise the worker would
            # block forever holding `lookahead` device batches in HBM and
            # the loader's thread pool would never shut down.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                it = iter(loader)
                try:
                    for batch in it:
                        if not _put(self._put_batch(batch)):
                            return
                finally:
                    close = getattr(it, "close", None)
                    if close is not None:
                        close()  # unwind the loader's executor context
                _put(_END)
            except BaseException as e:  # propagate into the training thread
                _put(e)

        threading.Thread(target=worker, daemon=True).start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            while not q.empty():  # release buffered device batches
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    # ------------------------------------------------------------------
    def train(self) -> None:
        experiment_name = self.cfg.get("experiment_name")
        if experiment_name:
            self.tracker.set_experiment(experiment_name)
        with self.tracker.start_run(run_name=self.cfg.get("run_name")):
            self.tracker.log_params(flatten_dict(self.cfg))
            val_loss = float("inf")
            if self.train_loader is not None:
                # resume continues the shuffle/mask RNG stream instead of
                # replaying the original run's first epochs
                self.train_loader.epoch = self.start_epoch
            if (self.start_epoch >= self.max_epochs
                    or self.global_step >= self.max_steps):
                logging.info(
                    "Nothing to train: resumed at epoch %d / step %d with "
                    "max_epochs=%d max_steps=%d", self.start_epoch,
                    self.global_step, self.max_epochs, self.max_steps)
            for epoch in range(self.start_epoch + 1, self.max_epochs + 1):
                if self.global_step >= self.max_steps:
                    break  # budget already exhausted: no zero-step epochs
                logging.info("Epoch %d/%d starting...", epoch, self.max_epochs)
                train_loss = self._train_one_epoch(epoch)
                self.tracker.log_metric("train/loss", train_loss, step=self.global_step)
                logging.info("Epoch %d completed | train_loss=%.4f | global_step=%d",
                             epoch, train_loss, self.global_step)
                self._log_examples(self.train_loader, prefix="train", epoch=epoch,
                                   max_batches=1)

                if self.run_validation and self.val_loader is not None:
                    logging.info("Running validation...")
                    val_loss = self._evaluate_rec_loss(self.val_loader)
                    self.tracker.log_metric("val/loss", val_loss, step=self.global_step)
                    logging.info("Validation done | val_loss=%.4f", val_loss)

                # fold this epoch's validation into the watermark BEFORE
                # saving latest.ckpt so a resume-from-latest can't overwrite
                # best.ckpt with a worse epoch
                is_best = val_loss < self.best_val
                if is_best:
                    self.best_val = val_loss
                latest = self.save_dir / "latest.ckpt"
                self._save(latest, epoch)
                self.tracker.log_artifact(str(latest))
                if is_best:
                    best = self.save_dir / "best.ckpt"
                    self._save(best, epoch)
                    self.tracker.log_artifact(str(best))
                    logging.info("New best model saved at %s (val_loss=%.4f)",
                                 best, self.best_val)
                self._log_examples(self.val_loader, prefix="val", epoch=epoch)

                if self.global_step >= self.max_steps:
                    logging.info("Reached max steps (%d). Stopping.", self.max_steps)
                    break

    def _train_one_epoch(self, epoch: int) -> float:
        # accumulated DEVICE-side: float() per step would sync the pipeline
        # and serialize dispatch against the prefetch thread
        running = {"loss": jnp.zeros(()), "rec": jnp.zeros(()),
                   "adv": jnp.zeros(()), "dis": jnp.zeros(())}
        steps = 0
        progress_interval = max(1, self.train_steps_per_epoch // 20)
        t0 = time.time()
        for frames, masked, masks in self._device_prefetch(self.train_loader):
            if self.global_step >= self.max_steps:
                break  # BEFORE the step: a resume landing exactly at the
                # budget must not train (and checkpoint) one extra step
            if self._idw_hoist_pending:
                self._maybe_hoist_idw(masks)
            if self.profile_dir and not self._profiling \
                    and not self._profile_done \
                    and self.global_step >= self.profile_start:
                jax.profiler.start_trace(str(self.profile_dir))
                self._profiling = True
                self._profile_stop_at = self.global_step + self.profile_steps
            self.state, metrics = self.train_step(self.state, frames, masked, masks)
            steps += 1
            self.global_step += 1
            if self._profiling and self.global_step >= self._profile_stop_at:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                self._profiling = False
                self._profile_done = True
                logging.info("Profiler trace written to %s", self.profile_dir)

            if steps == 1:
                logging.info("Batch shapes | frames=%s", tuple(frames.shape))
            if steps % progress_interval == 0 or steps == self.train_steps_per_epoch:
                pct = steps / self.train_steps_per_epoch
                bar_len = 20
                filled = int(bar_len * pct)
                bar = "|" * filled + "." * (bar_len - filled)
                logging.info("Epoch %d/%d |%s| %.1f%% (step %d/%d)", epoch,
                             self.max_epochs, bar, pct * 100, steps,
                             self.train_steps_per_epoch)
            if self.global_step % self.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                self.tracker.log_metric("train/step_loss", m["loss"], step=self.global_step)
                for key in ("rec_loss", "adv_loss", "dis_loss", "pool", "reg"):
                    if key in m:
                        self.tracker.log_metric(f"train/{key}", m[key], step=self.global_step)
                sps = steps / max(time.time() - t0, 1e-6)
                self.tracker.log_metric("train/steps_per_sec", sps, step=self.global_step)
                logging.info("Epoch %d | step %d/%d | loss=%.4f | %.2f steps/s",
                             epoch, self.global_step, self.max_steps, m["loss"], sps)

            m = metrics
            running["loss"] = running["loss"] + m["loss"]
            running["rec"] = running["rec"] + m["rec_loss"]
            running["adv"] = running["adv"] + m.get("adv_loss", 0.0)
            running["dis"] = running["dis"] + m.get("dis_loss", 0.0)
            if self.global_step >= self.max_steps:
                break

        if self._profiling:
            # the loop ended (max_steps break or final epoch) inside the
            # profile window — flush the trace instead of losing it
            jax.block_until_ready(self.state)
            jax.profiler.stop_trace()
            self._profiling = False
            self._profile_done = True
            logging.info("Profiler trace written to %s (flushed at loop exit)",
                         self.profile_dir)

        denom = max(1, steps)
        running = {k: float(v) for k, v in running.items()}
        self.last_rec_loss = running["rec"] / denom
        self.last_adv_loss = running["adv"] / denom
        self.last_dis_loss = running["dis"] / denom
        return running["loss"] / denom

    def _evaluate_rec_loss(self, loader) -> float:
        if loader is None:
            return 0.0
        # The reference instantiates RainfallMetricSuites but never updates
        # them (train.py:168-170, dead code); here `train.eval_metrics: true`
        # activates on-device metric accumulation during validation.
        use_metrics = bool(self.cfg.get("train", {}).get("eval_metrics", False))
        suite = None
        if use_metrics:
            from ..metrics import MetricConfig, RainfallMetricSuite

            suite = RainfallMetricSuite(MetricConfig())
        total, batches = 0.0, 0
        for batch in loader:
            frames, masked, masks = self._put_batch(batch)
            total += float(self.eval_step(self.state, frames, masked, masks))
            if suite is not None:
                preds = self.predict_fn(self.state, masked, masks)
                suite.update(preds, frames)
            batches += 1
        if suite is not None:
            for key, value in suite.compute().items():
                self.tracker.log_metric(f"val/{key}", value, step=self.global_step)
        return total / max(1, batches)

    # ------------------------------------------------------------------
    def _log_examples(self, loader, prefix: str, epoch: int, max_batches: int = 5,
                      samples_per_batch: int = 1) -> None:
        """Colorized GT|pred grids with stat annotations (train.py:384-466)."""
        if loader is None:
            return
        save_dir = self.save_dir / "artifacts"
        save_dir.mkdir(parents=True, exist_ok=True)
        from ..metrics.plots import example_image

        for b_idx, batch in zip(range(max_batches), loader):
            frames, masked, masks = self._put_batch(batch)
            preds = np.asarray(self.predict_fn(self.state, masked, masks))
            frames = np.asarray(frames)
            for idx in range(min(samples_per_batch, frames.shape[0])):
                gt = frames[idx, ..., 0]          # (T, H, W)
                pd = np.clip(preds[idx, ..., 0], 0, 1)
                pil = example_image(gt, pd, scale=self.viz_scale,
                                    vmin=self.viz_vmin, vmax=self.viz_vmax)
                out_path = save_dir / f"{prefix}_epoch{epoch}_batch{b_idx}_ex{idx}.png"
                pil.save(out_path)
                self.tracker.log_artifact(str(out_path))

    # ------------------------------------------------------------------
    def _save(self, path: Path, epoch: int) -> None:
        state = jax.device_get(self.state)
        payload = {
            "epoch": epoch,
            "global_step": self.global_step,
            "best_val": self.best_val,
            "generator": {"params": state.gen_params, "extra": state.gen_extra},
            "optimizer_g": state.opt_g,
        }
        if state.disc_params is not None:
            payload["discriminator"] = {"params": state.disc_params,
                                        "extra": state.disc_extra}
            payload["optimizer_d"] = state.opt_d
        save_checkpoint(path, payload)

    def load(self, path: str | Path) -> None:
        """Resume training state (params + optimizer + counters)."""
        if str(path).endswith((".pt", ".pth")):
            raise ValueError(
                f"{path} is a torch checkpoint: training resume needs this "
                "framework's msgpack format (it carries optimizer state); "
                "torch weights can seed INFERENCE via models/torch_import "
                "(inference.driver.variables_from_checkpoint)")
        raw = load_checkpoint_raw(path)
        state = jax.device_get(self.state)
        import flax.serialization as ser

        def restore(template, data):
            return ser.from_state_dict(template, data)

        def restore_opt(template, data):
            return ser.from_state_dict(template, _migrate_opt_state(template, data))

        gen = raw["generator"]
        new = state.replace(
            gen_params=restore(state.gen_params, gen["params"]),
            gen_extra=restore(state.gen_extra, gen["extra"]),
            opt_g=restore_opt(state.opt_g, raw["optimizer_g"]),
        )
        if state.disc_params is not None and "discriminator" in raw:
            new = new.replace(
                disc_params=restore(state.disc_params, raw["discriminator"]["params"]),
                disc_extra=restore(state.disc_extra, raw["discriminator"]["extra"]),
                opt_d=restore_opt(state.opt_d, raw["optimizer_d"]),
            )
        self.global_step = int(raw.get("global_step", 0))
        self.start_epoch = int(raw.get("epoch", 0))
        # Restore the best-validation watermark (older checkpoints lack it)
        # so a resumed run can't clobber best.ckpt with a worse epoch, and
        # keep TrainState.step consistent with the global counter.
        if "best_val" in raw:
            self.best_val = float(raw["best_val"])
        new = new.replace(step=jnp.asarray(self.global_step, jnp.int32))
        self.state = jax.device_put(new, replicated_sharding(self.mesh))
        logging.info("Resumed from %s | global_step=%d epoch=%d best_val=%s",
                     path, self.global_step, self.start_epoch,
                     f"{self.best_val:.4f}" if self.best_val != float("inf")
                     else "inf")
