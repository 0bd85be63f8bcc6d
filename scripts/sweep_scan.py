"""On-chip sweep of the serving program's scan-overhead knobs (VERDICT r2 #2).

PROFILE.md's trace shows 49.4% of serving device time in the `while` op
(the lax.scan over window chunks, which contains its body rows) and 4.6%
in `copy`. This sweeps the three knobs that attack the loop plumbing:

  - window_batch: windows per scan step (bigger = fewer steps, more VMEM)
  - scan_unroll:  lax.scan unroll factor (unrolled bodies let XLA overlap
                  chunk N's scatter-add with chunk N+1's generator)
  - accum_mode:   "carry" threads the overlap accumulator through the scan;
                  "stacked" emits per-chunk predictions and scatter-adds once
                  at the end (removes the carry dependency entirely)

Usage: python scripts/sweep_scan.py [--events 32] [--reps 10]
Prints one line per config; each timed region ends with a scalar host fetch
(tunneled backend: block_until_ready can return early).
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=32)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--configs", type=str, default=None,
                    help="comma list wb:unroll:mode, e.g. 8:1:carry,8:2:carry")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from p2igan_tpu.inference.driver import SlidingWindowReconstructor
    from p2igan_tpu.models import P2IGenerator

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)

    gen = P2IGenerator(H=H, W=W, length=T, base_channels=BASE,
                       idw_max_points=1280, idw_chunk=16384,
                       idw_factored=True, idw_shared_batch_mask=True)
    rng = np.random.default_rng(0)
    mask_flat = np.zeros((H * W,), np.float32)
    mask_flat[rng.choice(H * W, N_GAUGES, replace=False)] = 1.0

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        gauge = jnp.asarray(np.broadcast_to(
            mask_flat.reshape(1, 1, H, W, 1), (1, T, H, W, 1)).copy())
        variables = gen.init(jax.random.key(0),
                             jnp.zeros((1, T, H, W, 1), jnp.float32), gauge)
    variables = jax.device_get(variables)

    event_mask = np.broadcast_to(mask_flat.reshape(1, H, W, 1),
                                 (EVENT_T, H, W, 1)).astype(np.float32)
    masked_np = (rng.random((args.events, EVENT_T, H, W, 1),
                            dtype=np.float32) * event_mask[None])
    masks_np = np.broadcast_to(event_mask[None], masked_np.shape)
    masked = jnp.asarray(masked_np)
    masks = jnp.asarray(np.ascontiguousarray(masks_np))

    fold_gen, fold_vars = gen.fold_for_inference(variables)
    sync = jax.jit(jnp.sum)

    if args.configs:
        configs = []
        for tok in args.configs.split(","):
            wb, un, mode = tok.split(":")
            configs.append((int(wb), int(un), mode))
    else:
        configs = [
            (8, 1, "carry"),    # round-2 default (130.8 ev/s)
            (8, 2, "carry"),
            (8, 4, "carry"),
            (8, 1, "stacked"),
            (8, 2, "stacked"),
            (4, 2, "carry"),
            (4, 4, "carry"),
            (16, 2, "carry"),
            (16, 1, "stacked"),
        ]

    best = (None, 0.0)
    for wb, unroll, mode in configs:
        tag = f"wb={wb:2d} unroll={unroll} mode={mode:7s}"
        try:
            recon = SlidingWindowReconstructor(
                fold_gen, fold_vars, stride=16, overlap=12,
                window_batch=wb, output_scale=255.0, t_bucket=EVENT_T,
                scan_unroll=unroll, accum_mode=mode)
            fn = recon.compiled_batch_fn(EVENT_T, n_events=args.events)
            t0 = time.time()
            out = fn(masked, masks)
            assert np.isfinite(float(sync(out)))
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.reps):
                out = fn(masked, masks)
            float(sync(out))
            rate = args.reps * args.events / (time.time() - t0)
            print(f"{tag}  {rate:8.2f} ev/s  (compile+first {compile_s:.1f}s)",
                  flush=True)
            if rate > best[1]:
                best = (tag, rate)
        except Exception as e:
            print(f"{tag}  FAILED: {type(e).__name__}: {e}"[:200], flush=True)
    print(f"BEST: {best[0]}  {best[1]:.2f} ev/s", flush=True)


if __name__ == "__main__":
    main()
