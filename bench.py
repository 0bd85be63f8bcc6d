"""Benchmark: event reconstructions/sec + GAN steps/sec + MFU on one chip.

Headline: 128x128x16 event reconstructions/sec/chip over 64-frame gauge-masked
events with the reference inference protocol (stride 16, overlap 12, overlap
averaging, x255 + clip; reference scripts/infer.py:188-245,263-273), serving
mode = equal-length events through ONE flattened compiled program.

STAGED OUTPUT DISCIPLINE (round-2 postmortem): BENCH_r02 timed out (rc=124)
because the bench compiled 5+ large programs and printed a single JSON line
only at the very end — all-or-nothing under the driver's budget. Now each
stage prints a COMPLETE cumulative JSON line (flushed) the moment it lands,
so whichever line is last when a timeout hits carries every finished stage:

  1. inference  — flattened multi-event program (ONE remote compile)
  2. train      — full-config GAN step, batch 12 (ONE remote compile),
                  stis gauge selection hoisted out of the step
  3. families   — dk / stdk / simple events/sec through the same protocol
  4. family_train — dk / stdk / simple train steps/sec, batch 12, rec-loss
                  configs (reference trains every family: train.py:98-174)

Headline/family rows are the MEDIAN of >=3 timed blocks with min/max
emitted as ``{metric}_spread`` (VERDICT r4 item 8: self-vs-driver gaps must
be diagnosable from the artifact alone).

Model/optimizer init and the IDW gauge tables run on the host CPU backend —
they need no remote compile. Extras (sequential-dispatch inference, the
large-batch train sweep) only run with BENCH_FULL=1.

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is the
ratio to BASELINE.json's ``published`` value when present, else null. All
benchmark data is synthesized device-side: this environment reaches the chip
through a slow tunnel, so the bench measures compute, not the tunnel.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback
from pathlib import Path

import numpy as np

# Persistent XLA compilation cache: repeat runs on the same machine skip
# straight to execution (cold-cache remote compiles run ~60-120 s each).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/p2igan_jax_cache"))

V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak per v5e chip (f32 data still runs
# on the MXU with bf16 passes under the default precision config)

# BENCH_SMALL=1 shrinks every geometry knob so the FULL staged pipeline
# (all three stages, same code paths) runs in seconds on the CPU backend —
# the smoke test for the staged-output discipline itself
# (tests/test_full_chain.py). Default = the real headline workload.
_SMALL = bool(os.environ.get("BENCH_SMALL"))

EVENT_T = 8 if _SMALL else 64   # frames per event (16 windows at step 4)
N_EVENTS = 2 if _SMALL else 32  # measured ladder: 8 -> 16 (+2%) -> 32 (+1%,
# 132.3 ev/s); program size is N-independent (lax.scan over window chunks)
N_EVENTS_FAM = 2 if _SMALL else 8  # per-family rows: same protocol (simple
# measures ~+0.5 ev/s at the headline's 32-event geometry — PROFILE.md r5)
H = W = 32 if _SMALL else 128
T = 4 if _SMALL else 16
BASE = 16 if _SMALL else 64
N_GAUGES = 13 if _SMALL else 79
IDW_MAX_POINTS = 256 if _SMALL else 1280
STRIDE, OVERLAP = (4, 2) if _SMALL else (16, 12)
WINDOW_BATCH = 2 if _SMALL else 8
TRAIN_BATCHES = (2,) if _SMALL else (12, 4)
REPS = 2 if _SMALL else 10
TRAIN_REPS = 2 if _SMALL else 20

RESULT = {
    "metric": (f"{H}x{W}x{T} event reconstructions/sec/chip "
               f"(sliding-window infer, {EVENT_T}-frame events)"),
    "value": None,
    "unit": "events/sec",
    "vs_baseline": None,
    "vs_prev_round": None,
    "stages_done": [],
}


def _best_prev_round() -> float | None:
    """Best headline value across prior driver-captured BENCH_r*.json
    artifacts, so the bench itself reports the round-over-round trajectory
    (VERDICT r3 item 7). Each artifact stores the driver's record with the
    parsed final JSON line under "parsed"."""
    best = None
    for p in sorted(Path(__file__).parent.glob("BENCH_r*.json")):
        try:
            rec = json.loads(p.read_text())
            val = (rec.get("parsed") or {}).get("value")
            if val and (best is None or float(val) > best):
                best = float(val)
        except Exception:
            continue
    return best


def _emit() -> None:
    """Print the full cumulative record as one flushed JSON line. The driver
    takes the LAST parseable line, so every line must be complete."""
    print(json.dumps(RESULT), flush=True)


def _stage(name, fn) -> None:
    t0 = time.time()
    try:
        RESULT.update(fn())
    except Exception as e:  # keep later stages alive; surface the error
        traceback.print_exc(file=sys.stderr)
        RESULT[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
    RESULT[f"{name}_secs"] = round(time.time() - t0, 1)
    RESULT["stages_done"] = RESULT["stages_done"] + [name]
    _emit()


def _cpu(fn):
    """Run ``fn`` on the host CPU backend (no remote compile) and fetch the
    result to host numpy; falls back to the default backend when no CPU
    backend exists."""
    import jax

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return fn()
    with jax.default_device(cpu):
        out = fn()
    return jax.device_get(out)


def _aot(fn, *args):
    """AOT-compile a jitted fn ONCE; return (compiled callable, flops).

    The compiled object serves both execution and cost analysis, so each
    bench program is compiled exactly once (the bench's budget is dominated
    by XLA compiles, not by the timed runs)."""
    compiled = fn.lower(*args).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0
    return compiled, flops


_SYNC = {}


def _sync(x) -> float:
    """Scalar host fetch that proves the serial device queue drained: on the
    tunneled backend ``block_until_ready`` can return before the device
    finishes, so every timed region must end with one of these."""
    import jax
    import jax.numpy as jnp

    key = (x.shape, str(x.dtype))
    fn = _SYNC.get(key)
    if fn is None:
        fn = _SYNC[key] = jax.jit(jnp.sum)
    return float(fn(x))


def _gauge_mask_np(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    mask_flat = np.zeros((H * W,), np.float32)
    mask_flat[rng.choice(H * W, N_GAUGES, replace=False)] = 1.0
    return mask_flat


def _event_batch(mask_flat: np.ndarray, n_events: int, seed: int = 0):
    """(E, EVENT_T, H, W, 1) gauge-masked synthetic events + masks (host)."""
    rng = np.random.default_rng(seed)
    event_mask = np.broadcast_to(mask_flat.reshape(1, H, W, 1),
                                 (EVENT_T, H, W, 1)).astype(np.float32)
    masked = (rng.random((n_events, EVENT_T, H, W, 1), dtype=np.float32)
              * event_mask[None])
    masks = np.broadcast_to(event_mask[None], masked.shape)
    return masked, np.ascontiguousarray(masks)


def _prepare_idw_cpu(gen, mask_flat: np.ndarray):
    """Hoisted stis gauge-selection tables, computed on the host CPU backend
    (a constant of the mask — needs no remote compile; mirrors
    P2IGenerator.prepare_idw / trainer._maybe_hoist_idw)."""
    import jax.numpy as jnp

    from p2igan_tpu.ops.idw import factored_prepare_full
    from p2igan_tpu.ops.layers import InputBlock

    budget = InputBlock.gauge_budget(gen.idw_max_points, gen.length)
    prep = _cpu(lambda: factored_prepare_full(
        jnp.asarray(mask_flat.reshape(H, W)), budget, k=4, use_pallas=False))
    return tuple(np.asarray(p) for p in prep)


N_BLOCKS = 3  # timed blocks per metric: median + (min, max) spread


def _time_events(fn, masked, masks, n_events: int, reps: int):
    """Median events/sec over N_BLOCKS timed blocks + (min, max) spread.

    Each block dispatches ``reps`` programs and ends with a scalar host
    fetch (the serial device queue proves all dispatches ran). The first
    block is preceded by a full warmup execution, so compile/transfer
    effects land outside every timed region."""
    out = fn(masked, masks)  # warmup dispatch
    assert np.isfinite(_sync(out))
    rates = []
    for _ in range(N_BLOCKS):
        t0 = time.time()
        for _ in range(reps):
            out = fn(masked, masks)
        _sync(out)
        rates.append(reps * n_events / (time.time() - t0))
    return float(np.median(rates)), [round(min(rates), 4),
                                     round(max(rates), 4)]


def _make_reconstructor(gen, variables, window_batch: int = WINDOW_BATCH):
    from p2igan_tpu.inference.driver import SlidingWindowReconstructor

    if hasattr(gen, "fold_for_inference"):
        # serving path folds DOConv kernels once on host (as run_inference does)
        gen, variables = gen.fold_for_inference(variables)
    return SlidingWindowReconstructor(gen, variables, stride=STRIDE,
                                      overlap=OVERLAP,
                                      window_batch=window_batch,
                                      output_scale=255.0, t_bucket=EVENT_T)


def bench_inference(gen, variables):
    import jax.numpy as jnp

    recon = _make_reconstructor(gen, variables)
    masked, masks = _event_batch(_gauge_mask_np(0), N_EVENTS)
    masked, masks = jnp.asarray(masked), jnp.asarray(masks)

    # serving mode: all equal-length events through ONE flattened program
    fn, flops = _aot(recon.compiled_batch_fn(EVENT_T, n_events=N_EVENTS),
                     masked, masks)
    rate, spread = _time_events(fn, masked, masks, N_EVENTS, reps=REPS)
    # cost_analysis counts the scan body ONCE; true program FLOPs =
    # reported x trip count (epilogue <0.06%, PROFILE.md round-3 section)
    n_chunks = recon.n_scan_chunks(EVENT_T, N_EVENTS)
    flops_per_event = flops * n_chunks / N_EVENTS if flops else None
    mfu = (rate * flops_per_event / V5E_PEAK_FLOPS
           if flops_per_event else None)

    out = {
        "value": round(rate, 4),
        "events_per_sec_batched": round(rate, 4),
        "events_per_sec_spread": spread,
        "flops_per_event": flops_per_event,
        "mfu_inference": round(mfu, 5) if mfu is not None else None,
    }
    prev = _best_prev_round()
    if prev:
        out["vs_prev_round"] = round(rate / prev, 4)
    baseline_file = Path(__file__).parent / "BASELINE.json"
    if baseline_file.exists():
        published = json.loads(baseline_file.read_text()).get("published", {})
        ref = published.get("event_reconstructions_per_sec")
        if ref:
            out["vs_baseline"] = round(rate / float(ref), 4)

    if os.environ.get("BENCH_FULL"):
        # sequential-dispatch mode (one event per call, async pipeline)
        fn1, _ = _aot(recon.compiled_fn(EVENT_T), masked[0], masks[0])
        _sync(fn1(masked[0], masks[0]))
        t0 = time.time()
        outs = [fn1(masked[i], masks[i]) for i in range(N_EVENTS)]
        _sync(outs[-1])
        out["events_per_sec_sequential"] = round(
            N_EVENTS / (time.time() - t0), 4)
    return out


def _train_state(gen, disc, mask_flat: np.ndarray):
    """TrainState init on the host CPU backend: batch-1 shapes (params are
    batch-independent), zero remote compiles."""
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.training.steps import TrainState, make_optimizer

    def init():
        masks1 = jnp.asarray(np.broadcast_to(
            mask_flat.reshape(1, 1, H, W, 1), (1, T, H, W, 1)).copy())
        masked1 = jnp.zeros((1, T, H, W, 1), jnp.float32)
        gen_vars = dict(gen.init(jax.random.key(0), masked1, masks1))
        disc_vars = dict(disc.init(jax.random.key(1), masked1))
        return gen_vars, disc_vars

    gen_vars, disc_vars = _cpu(init)
    opt_g, opt_d = make_optimizer({"lr": 1e-4}), make_optimizer({"lr": 1e-4})
    gp, dp = gen_vars.pop("params"), disc_vars.pop("params")
    state = TrainState(step=np.zeros((), np.int32),
                       gen_params=gp, gen_extra=gen_vars,
                       opt_g=opt_g.init(gp), disc_params=dp,
                       disc_extra=disc_vars, opt_d=opt_d.init(dp))
    return state, opt_g, opt_d


def _bench_train_at_batch(gen, disc, batch: int, mask_flat, prep, reps: int):
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.training.steps import build_train_step

    state, opt_g, opt_d = _train_state(gen, disc, mask_flat)
    masks = jnp.asarray(np.broadcast_to(
        mask_flat.reshape(1, 1, H, W, 1), (batch, T, H, W, 1)).copy())
    frames = jax.random.uniform(jax.random.key(2), (batch, T, H, W, 1))
    masked = frames * masks

    step_fn = build_train_step(gen, disc, opt_g, opt_d, use_gan=True,
                               gan_loss_type="hinge",
                               adversarial_weight=0.01, k1_alpha=0.05,
                               donate=False, idw_prepared=prep)
    step_c, flops_per_step = _aot(step_fn, state, frames, masked, masks)
    state, metrics = step_c(state, frames, masked, masks)
    assert np.isfinite(float(metrics["loss"]))  # true host sync
    rates = []
    for _ in range(N_BLOCKS):
        t0 = time.time()
        for _ in range(reps):
            state, metrics = step_c(state, frames, masked, masks)
        float(metrics["loss"])  # steps chain through state: forces all
        rates.append(reps / (time.time() - t0))
    spread = [round(min(rates), 4), round(max(rates), 4)]
    return float(np.median(rates)), spread, flops_per_step, step_c, state


def bench_train(gen, disc):
    """Full-config GAN step: batch 12, 128^2 x 16 (p2igan_gan_baseline.json
    implied workload), stis gauge selection hoisted (VERDICT r2 item 3).
    Falls back to batch 4 on failure (error recorded, never swallowed)."""
    mask_flat = _gauge_mask_np(1)
    prep = None
    try:
        prep = _prepare_idw_cpu(gen, mask_flat)
    except Exception as e:
        RESULT["idw_prep_error"] = f"{type(e).__name__}: {e}"[:200]

    err = None
    for batch in TRAIN_BATCHES:
        try:
            steps_per_sec, spread, flops_per_step, step_c, state = \
                _bench_train_at_batch(gen, disc, batch, mask_flat, prep,
                                      reps=TRAIN_REPS)
            mfu = (steps_per_sec * flops_per_step / V5E_PEAK_FLOPS
                   if flops_per_step else None)
            out = {
                "gan_steps_per_sec": round(steps_per_sec, 4),
                "gan_steps_per_sec_spread": spread,
                "gan_batch": batch,
                "gan_samples_per_sec": round(steps_per_sec * batch, 3),
                "flops_per_step": flops_per_step or None,
                "mfu_train": round(mfu, 5) if mfu is not None else None,
            }
            if err:
                out["gan_batch12_error"] = err[:300]
            # measured training option (PROFILE.md "D 3D branch bf16",
            # +11%): the D's 3D branch in bf16. Reported as its own row —
            # the f32 default above stays the reference-parity headline
            # (the reference autocasts only its generator).
            try:
                import jax.numpy as jnp
                disc_bf16 = disc.clone(branch3d_dtype=jnp.bfloat16)
                sps_bf16, _, _, _, _ = _bench_train_at_batch(
                    gen, disc_bf16, batch, mask_flat, prep, reps=TRAIN_REPS)
                out["gan_steps_per_sec_d3d_bf16"] = round(sps_bf16, 4)
            except Exception as e:
                out["gan_d3d_bf16_error"] = f"{type(e).__name__}: {e}"[:200]
            if batch == 12 and os.environ.get("BENCH_FULL"):
                out.update(_bench_train_throughput(gen, disc, mask_flat, prep))
            return out
        except Exception as e:  # OOM at batch 12 -> retry smaller
            traceback.print_exc(file=sys.stderr)
            err = f"{type(e).__name__}: {e}"
    return {"gan_steps_per_sec": None, "gan_error": err[:300]}


def _bench_train_throughput(gen, disc, mask_flat, prep, batch: int = 128):
    """Throughput-optimal large-batch point (samples/sec keeps scaling past
    the config's batch 12: measured 214 -> 404.5 samples/s at 12 -> 128; 192+
    fail to compile on one v5e). BENCH_FULL only. Errors are REPORTED, not
    swallowed (ADVICE r2)."""
    try:
        sps, _, _, _, _ = _bench_train_at_batch(gen, disc, batch, mask_flat,
                                                prep, reps=10)
        return {"gan_samples_per_sec_max": round(sps * batch, 3),
                "gan_max_batch": batch}
    except Exception as e:
        traceback.print_exc(file=sys.stderr)
        return {"gan_max_batch_error": f"{type(e).__name__}: {e}"[:300]}


def bench_families():
    """Per-family events/sec rows (VERDICT r2 item 5): dk / stdk / simple
    through the same sliding-window reconstruction protocol as the headline
    (reference per-frame loops: dk.py:191-197, stdk.py:149-186)."""
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.models import (DKGenerator, STDKGenerator,
                                   SimpleGenerator)

    mask_flat = _gauge_mask_np(0)
    masked_np, masks_np = _event_batch(mask_flat, N_EVENTS_FAM)
    masked, masks = jnp.asarray(masked_np), jnp.asarray(masks_np)
    out = {}
    # simple runs FIRST (VERDICT r4 item 2: its round-4 driver number was
    # 13% below the self-measure; fresh ordering + per-row spread make any
    # inter-stage interference visible in the artifact itself).
    # shared_batch_mask: the stis gauge workload's mask is one fixed station
    # set — same declaration the flagship makes via idw_shared_batch_mask
    for name, gen in (("simple", SimpleGenerator(in_channels=1,
                                                 out_channels=1,
                                                 base_channels=BASE)),
                      ("dk", DKGenerator(length=T, shared_batch_mask=True)),
                      ("stdk", STDKGenerator(length=T,
                                             shared_batch_mask=True))):
        try:
            variables = _cpu(lambda g=gen: g.init(
                jax.random.key(0),
                jnp.asarray(masked_np[:1, :T]), jnp.asarray(masks_np[:1, :T])))
            recon = _make_reconstructor(gen, variables)
            fn, flops = _aot(
                recon.compiled_batch_fn(EVENT_T, n_events=N_EVENTS_FAM),
                masked, masks)
            rate, spread = _time_events(fn, masked, masks, N_EVENTS_FAM,
                                        reps=REPS)
            out[f"{name}_events_per_sec"] = round(rate, 4)
            out[f"{name}_events_per_sec_spread"] = spread
            if flops:  # scan-body-once correction, as in bench_inference
                out[f"{name}_flops_per_event"] = (
                    flops * recon.n_scan_chunks(EVENT_T, N_EVENTS_FAM)
                    / N_EVENTS_FAM)
        except Exception as e:
            traceback.print_exc(file=sys.stderr)
            out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def bench_family_train():
    """Per-family TRAIN steps/sec (VERDICT r4 item 1): the reference trains
    every family through the same model-agnostic loop
    (scripts/train.py:98-174) with rec-loss-only configs for dk/stdk
    (config/dk.json, stdk_gauge.json: use_gan=0, k1_weight=0, Adam b1=0) —
    this framework had zero training-perf evidence outside the GAN step.
    dk/stdk run the round-5 differentiable fused VMEM tail (custom VJP,
    ops/pallas/dk_mlp_kernel.py); simple trains with BatchNorm updates."""
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.models import (DKGenerator, STDKGenerator,
                                   SimpleGenerator)
    from p2igan_tpu.training.steps import TrainState, build_train_step, \
        make_optimizer

    batch = TRAIN_BATCHES[0]
    mask_flat = _gauge_mask_np(1)
    masks = jnp.asarray(np.broadcast_to(
        mask_flat.reshape(1, 1, H, W, 1), (batch, T, H, W, 1)).copy())
    frames = jax.random.uniform(jax.random.key(3), (batch, T, H, W, 1))
    masked = frames * masks
    out = {}
    for name, gen in (("dk", DKGenerator(length=T, shared_batch_mask=True)),
                      ("stdk", STDKGenerator(length=T,
                                             shared_batch_mask=True)),
                      ("simple", SimpleGenerator(in_channels=1,
                                                 out_channels=1,
                                                 base_channels=BASE))):
        try:
            def init(g=gen):
                gv = dict(g.init(jax.random.key(0),
                                 jnp.zeros((1, T, H, W, 1), jnp.float32),
                                 masks[:1]))
                return gv
            gv = _cpu(init)
            opt = make_optimizer({"lr": 1e-4})
            gp = gv.pop("params")
            state = TrainState(step=np.zeros((), np.int32), gen_params=gp,
                               gen_extra=gv, opt_g=opt.init(gp))
            step_fn = build_train_step(gen, None, opt, None, use_gan=False,
                                       k1_alpha=0.0, donate=False)
            step_c, flops = _aot(step_fn, state, frames, masked, masks)
            state, metrics = step_c(state, frames, masked, masks)
            assert np.isfinite(float(metrics["loss"]))
            rates = []
            for _ in range(N_BLOCKS):
                t0 = time.time()
                for _ in range(TRAIN_REPS):
                    state, metrics = step_c(state, frames, masked, masks)
                float(metrics["loss"])
                rates.append(TRAIN_REPS / (time.time() - t0))
            out[f"{name}_train_steps_per_sec"] = round(
                float(np.median(rates)), 4)
            out[f"{name}_train_steps_per_sec_spread"] = [
                round(min(rates), 4), round(max(rates), 4)]
            if flops:
                out[f"{name}_train_flops_per_step"] = flops
        except Exception as e:
            traceback.print_exc(file=sys.stderr)
            out[f"{name}_train_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.models import P2IDiscriminator, P2IGenerator

    gen = P2IGenerator(H=H, W=W, length=T, base_channels=BASE,
                       idw_max_points=IDW_MAX_POINTS, idw_chunk=16384,
                       idw_factored=True, idw_shared_batch_mask=True)
    mask_flat = _gauge_mask_np(0)
    gauge = np.broadcast_to(mask_flat.reshape(1, 1, H, W, 1),
                            (1, T, H, W, 1)).copy()
    variables = _cpu(lambda: gen.init(jax.random.key(0),
                                      jnp.zeros((1, T, H, W, 1), jnp.float32),
                                      jnp.asarray(gauge)))

    _stage("inference", lambda: bench_inference(gen, variables))
    _stage("train", lambda: bench_train(gen, P2IDiscriminator(in_channels=T)))
    _stage("families", bench_families)
    _stage("family_train", bench_family_train)


if __name__ == "__main__":
    main()
