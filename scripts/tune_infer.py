"""A/B micro-tuning of the inference event program on the real chip.

Compares window_batch sizes for the sliding-window event program (folded
weights) and alternative formulations of downsample_duplicate_channels.
Prints one line per variant; used to pick defaults, results recorded in
PROFILE.md.
"""

from __future__ import annotations

# Allow running as `python scripts/<name>.py` without installing the package.
import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import time

import numpy as np

EVENT_T = 64
H = W = 128
T = 16


def _timeit(fn, *args, reps=20) -> float:
    import jax
    import jax.numpy as jnp

    # tunnel sync discipline: block_until_ready can return before the device
    # finishes on the tunneled backend; a scalar host fetch through the
    # serial device queue proves all timed dispatches executed
    sync = jax.jit(jnp.sum)
    float(sync(fn(*args)))
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    float(sync(out))
    return (time.time() - t0) / reps


def main() -> None:
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.inference.driver import SlidingWindowReconstructor
    from p2igan_tpu.models import P2IGenerator

    rng = np.random.default_rng(0)
    mask_flat = np.zeros((H * W,), np.float32)
    mask_flat[rng.choice(H * W, 79, replace=False)] = 1.0

    gen = P2IGenerator(H=H, W=W, length=T, base_channels=64,
                       idw_max_points=1280, idw_chunk=16384, idw_factored=True,
                       idw_shared_batch_mask=True)
    init_masked = jnp.zeros((4, T, H, W, 1), jnp.float32)
    gauge4 = jnp.asarray(np.broadcast_to(
        mask_flat.reshape(1, 1, H, W, 1), (4, T, H, W, 1)).astype(np.float32))
    variables = gen.init(jax.random.key(0), init_masked, gauge4)
    gen_f, vars_f = gen.fold_for_inference(variables)

    ev_mask = jnp.asarray(np.broadcast_to(
        mask_flat.reshape(1, H, W, 1), (EVENT_T, H, W, 1)).astype(np.float32))
    ev_masked = jax.random.uniform(jax.random.key(1), (EVENT_T, H, W, 1)) * ev_mask

    for wb in (4, 8, 16):
        recon = SlidingWindowReconstructor(gen_f, vars_f, stride=16, overlap=12,
                                           window_batch=wb, output_scale=255.0,
                                           t_bucket=EVENT_T)
        fn = recon.compiled_fn(EVENT_T)
        ms = _timeit(fn, ev_masked, ev_mask) * 1e3
        print(f"window_batch={wb:2d}: {ms:7.2f} ms/event  "
              f"({1e3 / ms:6.1f} events/sec)", flush=True)

    # scan-overhead knobs on the HEADLINE program (flattened multi-event,
    # VERDICT r2 item 2): unroll amortizes while-loop plumbing, "stacked"
    # removes the accumulator carry (one scatter-add epilogue), large wb
    # under stacked approaches a fully unrolled single generator call
    import os

    n_events = int(os.environ.get("TUNE_N_EVENTS", "16"))
    bm = jnp.stack([ev_masked] * n_events)
    bk = jnp.broadcast_to(ev_mask[None], bm.shape)
    for kw in ({}, {"scan_unroll": 2}, {"scan_unroll": 4},
               {"accum_mode": "stacked"},
               {"accum_mode": "stacked", "scan_unroll": 2},
               {"accum_mode": "stacked", "scan_unroll": 4},
               {"accum_mode": "stacked", "window_batch": 16},
               {"accum_mode": "stacked", "window_batch": 32},
               {"window_batch": 16, "scan_unroll": 2}):
        wb = kw.pop("window_batch", 8)
        recon = SlidingWindowReconstructor(gen_f, vars_f, stride=16,
                                           overlap=12, window_batch=wb,
                                           output_scale=255.0,
                                           t_bucket=EVENT_T, **kw)
        try:
            fn = recon.compiled_batch_fn(EVENT_T, n_events=n_events)
            ms = _timeit(fn, bm, bk, reps=10) * 1e3 / n_events
            print(f"batch{n_events} wb={wb:2d} {kw}: {ms:7.2f} ms/event  "
                  f"({1e3 / ms:6.1f} events/sec)", flush=True)
        except Exception as e:
            print(f"batch{n_events} wb={wb:2d} {kw}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    # downsample formulation A/B at the decoder's hot shape
    from p2igan_tpu.ops.convs import max_pool2d

    x = jax.random.uniform(jax.random.key(2), (8, 128, 128, 64))

    def ds_current(x, length=T):
        from p2igan_tpu.ops.layers import downsample_duplicate_channels

        return downsample_duplicate_channels(x, length)

    def ds_stack(x, length=T):
        B, Hh, Ww, C = x.shape
        y = max_pool2d(x, 2, 2)
        y = y.reshape(B, Hh // 2, Ww // 2, C, 1)
        y = jnp.concatenate([y, y], axis=-1)
        return y.reshape(B, Hh // 2, Ww // 2, C * 2)

    a = jax.jit(ds_current)
    b = jax.jit(ds_stack)
    ra = np.asarray(a(x))
    rb = np.asarray(b(x))
    print("downsample variants equal:", bool(np.array_equal(ra, rb)), flush=True)
    print(f"ds_current: {_timeit(a, x) * 1e3:.3f} ms", flush=True)
    print(f"ds_stack:   {_timeit(b, x) * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
