"""Consolidated on-chip sweep harness (VERDICT r3 item 8).

One entry point for the three measurement surfaces that previously lived in
separate scripts (sweep_scan / sweep_train / tune_infer), sharing the
AOT-compile + scalar-host-fetch timing discipline and the flagship
model/mask/event builders:

    python scripts/sweep.py scan   [--events 32] [--reps 10] [--configs ...]
    python scripts/sweep.py train  [--reps 20] [--batches 12,48,128,192]
                                   [--d3d-dtype float32|bfloat16]
    python scripts/sweep.py infer  [--reps 20]

`scan`  — serving-program scan-overhead knobs (window_batch, scan_unroll,
          accum_mode) on the flattened multi-event headline program.
`train` — GAN train-step knobs: idw gauge-selection hoisting, donation,
          batch ladder, and the D 3D-branch dtype (PROFILE.md "D 3D branch
          bf16": measured 17.92 -> 19.86 steps/s at batch 12).
`infer` — single-event window_batch ladder + downsample formulation A/B.

Timing discipline: on the tunneled backend ``block_until_ready`` can return
before the device finishes; every timed region ends with a scalar host fetch
(``float(jnp.sum(x))``) — the device queue is serial, so the final program's
completion proves all timed dispatches executed (BASELINE.md).
"""

from __future__ import annotations

# Allow running as `python scripts/<name>.py` without installing the package.
import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/p2igan_jax_cache"))

H = W = 128
T = 16
EVENT_T = 64
BASE = 64
N_GAUGES = 79


# --------------------------------------------------------------------------
# shared builders / timing
# --------------------------------------------------------------------------

def timeit(fn, *args, reps: int = 20) -> float:
    """Seconds per call; ends with a scalar host fetch (see module doc)."""
    import jax
    import jax.numpy as jnp

    sync = jax.jit(jnp.sum)

    def _fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(sync(leaf))

    _fetch(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    return (time.time() - t0) / reps


def gauge_mask(seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    mask_flat = np.zeros((H * W,), np.float32)
    mask_flat[rng.choice(H * W, N_GAUGES, replace=False)] = 1.0
    return mask_flat


def build_flagship(mask_flat: np.ndarray):
    """Flagship generator + host-initialized variables (no remote compile)."""
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.models import P2IGenerator

    gen = P2IGenerator(H=H, W=W, length=T, base_channels=BASE,
                       idw_max_points=1280, idw_chunk=16384,
                       idw_factored=True, idw_shared_batch_mask=True)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        gauge = jnp.asarray(np.broadcast_to(
            mask_flat.reshape(1, 1, H, W, 1), (1, T, H, W, 1)).copy())
        variables = gen.init(jax.random.key(0),
                             jnp.zeros((1, T, H, W, 1), jnp.float32), gauge)
    return gen, jax.device_get(variables)


def build_events(mask_flat: np.ndarray, n_events: int, seed: int = 0):
    """(masked, masks) numpy event batches under the fixed gauge mask."""
    rng = np.random.default_rng(seed)
    event_mask = np.broadcast_to(mask_flat.reshape(1, H, W, 1),
                                 (EVENT_T, H, W, 1)).astype(np.float32)
    masked = (rng.random((n_events, EVENT_T, H, W, 1), dtype=np.float32)
              * event_mask[None])
    masks = np.ascontiguousarray(
        np.broadcast_to(event_mask[None], masked.shape))
    return masked, masks


# --------------------------------------------------------------------------
# scan: serving-program knobs on the flattened multi-event program
# --------------------------------------------------------------------------

def cmd_scan(args) -> None:
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.inference.driver import SlidingWindowReconstructor

    print(f"backend={jax.default_backend()}", flush=True)
    mask_flat = gauge_mask(0)
    gen, variables = build_flagship(mask_flat)
    fold_gen, fold_vars = gen.fold_for_inference(variables)
    masked_np, masks_np = build_events(mask_flat, args.events)
    masked, masks = jnp.asarray(masked_np), jnp.asarray(masks_np)

    if args.configs:
        configs = []
        for tok in args.configs.split(","):
            wb, un, mode = tok.split(":")
            configs.append((int(wb), int(un), mode))
    else:
        configs = [
            (8, 1, "carry"),    # round-2 default
            (8, 2, "carry"), (8, 4, "carry"),
            (8, 1, "stacked"), (8, 2, "stacked"),
            (4, 2, "carry"), (4, 4, "carry"),
            (16, 2, "carry"), (16, 1, "stacked"),
        ]

    best = (None, 0.0)
    for wb, unroll, mode in configs:
        tag = f"wb={wb:2d} unroll={unroll} mode={mode:7s}"
        try:
            recon = SlidingWindowReconstructor(
                fold_gen, fold_vars, stride=16, overlap=12, window_batch=wb,
                output_scale=255.0, t_bucket=EVENT_T,
                scan_unroll=unroll, accum_mode=mode)
            fn = recon.compiled_batch_fn(EVENT_T, n_events=args.events)
            sec = timeit(fn, masked, masks, reps=args.reps)
            rate = args.events / sec
            print(f"{tag}  {rate:8.2f} ev/s", flush=True)
            if rate > best[1]:
                best = (tag, rate)
        except Exception as e:
            print(f"{tag}  FAILED: {type(e).__name__}: {e}"[:200], flush=True)
    print(f"BEST: {best[0]}  {best[1]:.2f} ev/s", flush=True)


# --------------------------------------------------------------------------
# train: GAN step knobs
# --------------------------------------------------------------------------

def cmd_train(args) -> None:
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.models import P2IDiscriminator
    from p2igan_tpu.ops.idw import factored_prepare_full
    from p2igan_tpu.ops.layers import InputBlock
    from p2igan_tpu.training.steps import (TrainState, build_train_step,
                                           make_optimizer)

    print(f"backend={jax.default_backend()}", flush=True)
    mask_flat = gauge_mask(1)
    gen, gen_vars = build_flagship(mask_flat)
    disc = P2IDiscriminator(in_channels=T,
                            branch3d_dtype=jnp.dtype(args.d3d_dtype))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        disc_vars = dict(disc.init(jax.random.key(1),
                                   jnp.zeros((1, T, H, W, 1), jnp.float32)))
        budget = InputBlock.gauge_budget(gen.idw_max_points, gen.length)
        prep = factored_prepare_full(jnp.asarray(mask_flat.reshape(H, W)),
                                     budget, k=4, use_pallas=False)
    gen_vars, disc_vars = jax.device_get(dict(gen_vars)), jax.device_get(disc_vars)
    prep = tuple(np.asarray(p) for p in prep)
    opt_g, opt_d = make_optimizer({"lr": 1e-4}), make_optimizer({"lr": 1e-4})

    def fresh_state():
        gv, dv = dict(gen_vars), dict(disc_vars)
        gp, dp = gv.pop("params"), dv.pop("params")
        return TrainState(step=np.zeros((), np.int32), gen_params=gp,
                          gen_extra=gv, opt_g=opt_g.init(gp), disc_params=dp,
                          disc_extra=dv, opt_d=opt_d.init(dp))

    def run(batch: int, donate: bool, reps: int, use_prep: bool = True):
        masks = jnp.asarray(np.broadcast_to(
            mask_flat.reshape(1, 1, H, W, 1), (batch, T, H, W, 1)).copy())
        frames = jax.random.uniform(jax.random.key(2), (batch, T, H, W, 1))
        masked = frames * masks
        step = build_train_step(gen, disc, opt_g, opt_d, use_gan=True,
                                gan_loss_type="hinge",
                                adversarial_weight=0.01, k1_alpha=0.05,
                                donate=donate,
                                idw_prepared=prep if use_prep else None)
        state = fresh_state()
        t0 = time.time()
        step_c = step.lower(state, frames, masked, masks).compile()
        compile_s = time.time() - t0
        state, metrics = step_c(state, frames, masked, masks)
        assert np.isfinite(float(metrics["loss"]))
        t0 = time.time()
        for _ in range(reps):
            state, metrics = step_c(state, frames, masked, masks)
        float(metrics["loss"])
        return reps / (time.time() - t0), compile_s

    def report(tag: str, batch: int, donate: bool, reps: int,
               use_prep: bool = True) -> None:
        try:
            sps, cs = run(batch, donate, reps, use_prep)
            print(f"{tag}  {sps:6.2f} steps/s  {sps * batch:7.1f} samples/s"
                  f"  (compile {cs:.0f}s)", flush=True)
        except Exception as e:
            print(f"{tag}  FAILED: {type(e).__name__}: {e}"[:200], flush=True)

    # hoisted vs inline gauge selection at the config batch (VERDICT r2 #3)
    report(f"batch=12 d3d={args.d3d_dtype} idw=hoisted donate=F", 12, False,
           args.reps, True)
    report(f"batch=12 d3d={args.d3d_dtype} idw=inline  donate=F", 12, False,
           args.reps, False)
    report(f"batch=12 d3d={args.d3d_dtype} idw=hoisted donate=T", 12, True,
           args.reps, True)
    for batch in [int(b) for b in args.batches.split(",") if int(b) != 12]:
        reps = max(4, args.reps * 12 // batch)
        report(f"batch={batch} d3d={args.d3d_dtype} donate=T", batch, True,
               reps, True)


# --------------------------------------------------------------------------
# infer: single-event ladder + downsample A/B
# --------------------------------------------------------------------------

def cmd_infer(args) -> None:
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.inference.driver import SlidingWindowReconstructor

    print(f"backend={jax.default_backend()}", flush=True)
    mask_flat = gauge_mask(0)
    gen, variables = build_flagship(mask_flat)
    gen_f, vars_f = gen.fold_for_inference(variables)

    ev_mask = jnp.asarray(np.broadcast_to(
        mask_flat.reshape(1, H, W, 1), (EVENT_T, H, W, 1)).astype(np.float32))
    ev_masked = jax.random.uniform(jax.random.key(1),
                                   (EVENT_T, H, W, 1)) * ev_mask

    for wb in (4, 8, 16):
        recon = SlidingWindowReconstructor(gen_f, vars_f, stride=16,
                                           overlap=12, window_batch=wb,
                                           output_scale=255.0,
                                           t_bucket=EVENT_T)
        fn = recon.compiled_fn(EVENT_T)
        ms = timeit(fn, ev_masked, ev_mask, reps=args.reps) * 1e3
        print(f"window_batch={wb:2d}: {ms:7.2f} ms/event  "
              f"({1e3 / ms:6.1f} events/sec)", flush=True)

    # downsample formulation A/B at the decoder's hot shape
    from p2igan_tpu.ops.convs import max_pool2d
    from p2igan_tpu.ops.layers import downsample_duplicate_channels

    x = jax.random.uniform(jax.random.key(2), (8, 128, 128, 64))

    def ds_stack(x, length=T):
        B, Hh, Ww, C = x.shape
        y = max_pool2d(x, 2, 2)
        y = y.reshape(B, Hh // 2, Ww // 2, C, 1)
        y = jnp.concatenate([y, y], axis=-1)
        return y.reshape(B, Hh // 2, Ww // 2, C * 2)

    a = jax.jit(lambda v: downsample_duplicate_channels(v, T))
    b = jax.jit(ds_stack)
    print("downsample variants equal:",
          bool(np.array_equal(np.asarray(a(x)), np.asarray(b(x)))), flush=True)
    print(f"ds_current: {timeit(a, x, reps=args.reps) * 1e3:.3f} ms", flush=True)
    print(f"ds_stack:   {timeit(b, x, reps=args.reps) * 1e3:.3f} ms", flush=True)


# --------------------------------------------------------------------------
# bf16: narrow decoder-dtype serving experiment (VERDICT r4 item 5)
# --------------------------------------------------------------------------

def cmd_bf16(args) -> None:
    """bf16 activations ONLY inside the conv pyramid, f32 preserved at the
    IDW combine and scatter boundaries.

    ``P2IGenerator.compute_dtype`` casts AFTER the InputBlock (the f32
    Pallas multi-window combine keeps its layout) and the output head casts
    back to f32 before tanh — exactly the narrow scope the round-4 serving
    trace points at (~1.0 ms/event of f32<->bf16 conversion fusions glued
    to the decoder convs). The round-2 end-to-end-bf16 negative predates
    the multi-window combine kernel and the dense grouped-conv expansion;
    this measures the CURRENT program. Also reports output error vs f32
    (outputs are x255-scaled frames)."""
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.inference.driver import SlidingWindowReconstructor

    print(f"backend={jax.default_backend()}", flush=True)
    mask_flat = gauge_mask(0)
    gen, variables = build_flagship(mask_flat)
    masked_np, masks_np = build_events(mask_flat, args.events)
    masked, masks = jnp.asarray(masked_np), jnp.asarray(masks_np)

    outs = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        g = gen.clone(compute_dtype=dtype)
        fold_gen, fold_vars = g.fold_for_inference(variables)
        recon = SlidingWindowReconstructor(
            fold_gen, fold_vars, stride=16, overlap=12,
            window_batch=args.window_batch, output_scale=255.0,
            t_bucket=EVENT_T)
        fn = recon.compiled_batch_fn(EVENT_T, n_events=args.events)
        sec = timeit(fn, masked, masks, reps=args.reps)
        rate = args.events / sec
        outs[name] = (rate, np.asarray(fn(masked, masks), np.float32))
        print(f"compute_dtype={name}  wb={args.window_batch}  "
              f"{rate:8.2f} ev/s", flush=True)

    ref, test = outs["f32"][1], outs["bf16"][1]
    err = test - ref
    print(f"bf16 vs f32 (x255 scale): rmse={float(np.sqrt((err**2).mean())):.4f}"
          f"  max_abs={float(np.abs(err).max()):.4f}"
          f"  speedup={outs['bf16'][0] / outs['f32'][0]:.4f}x", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("scan", help="serving scan-overhead knobs")
    p.add_argument("--events", type=int, default=32)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--configs", type=str, default=None,
                   help="comma list wb:unroll:mode, e.g. 8:1:carry,8:2:carry")
    p.set_defaults(fn=cmd_scan)

    p = sub.add_parser("train", help="GAN train-step knobs")
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--batches", type=str, default="12,48,128")
    p.add_argument("--d3d-dtype", type=str, default="float32",
                   choices=("float32", "bfloat16"))
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("infer", help="single-event ladder + downsample A/B")
    p.add_argument("--reps", type=int, default=20)
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("bf16", help="narrow bf16-decoder serving experiment")
    p.add_argument("--events", type=int, default=32)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--window-batch", type=int, default=8)
    p.set_defaults(fn=cmd_bf16)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
