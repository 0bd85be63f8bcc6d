"""Benchmark: 128x128x16 event reconstructions/sec/chip (sliding-window infer).

Runs the flagship P2IGenerator over gauge-masked fake events with the
reference inference protocol (stride 16, overlap 12, overlap averaging,
x255 + clip) and reports throughput. Prints ONE JSON line.

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is the
ratio to BASELINE.json's ``published`` value when present, else null.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.inference.driver import SlidingWindowReconstructor
    from p2igan_tpu.models import P2IGenerator

    EVENT_T = 64          # frames per event (16 windows at step 4)
    N_EVENTS = 8
    H = W = 128
    T = 16

    gen = P2IGenerator(H=H, W=W, length=T, base_channels=64,
                       idw_max_points=1280, idw_chunk=16384, idw_factored=True,
                       idw_shared_batch_mask=True)
    rng = np.random.default_rng(0)
    init_masked = jnp.zeros((4, T, H, W, 1), jnp.float32)
    mask_flat = np.zeros((H * W,), np.float32)
    mask_flat[rng.choice(H * W, 79, replace=False)] = 1.0
    gauge = np.broadcast_to(mask_flat.reshape(1, 1, H, W, 1), (4, T, H, W, 1)).copy()
    variables = gen.init(jax.random.key(0), init_masked, jnp.asarray(gauge))

    recon = SlidingWindowReconstructor(gen, variables, stride=16, overlap=12,
                                       window_batch=8, output_scale=255.0,
                                       t_bucket=EVENT_T)

    # events synthesized on device: the benchmark measures reconstruction
    # throughput, not this environment's tunneled host<->device link
    event_mask = jnp.asarray(np.broadcast_to(
        mask_flat.reshape(1, H, W, 1), (EVENT_T, H, W, 1)).astype(np.float32))
    keys = jax.random.split(jax.random.key(0), N_EVENTS)
    events = [
        (jax.random.uniform(k, (EVENT_T, H, W, 1)) * event_mask, event_mask)
        for k in keys
    ]

    fn = recon._compiled.get(EVENT_T) or recon._build(EVENT_T)
    recon._compiled[EVENT_T] = fn
    out = fn(*events[0])  # warmup / compile
    assert np.isfinite(np.asarray(out)).all()

    t0 = time.time()
    outs = [fn(m, k) for m, k in events]  # async dispatch
    jax.block_until_ready(outs)
    elapsed = time.time() - t0
    rate = N_EVENTS / elapsed
    assert all(bool(jnp.isfinite(o).all()) for o in outs)

    vs = None
    baseline_file = Path(__file__).parent / "BASELINE.json"
    if baseline_file.exists():
        published = json.loads(baseline_file.read_text()).get("published", {})
        ref = published.get("event_reconstructions_per_sec")
        if ref:
            vs = rate / float(ref)

    print(json.dumps({
        "metric": "128x128x16 event reconstructions/sec/chip (sliding-window infer, 64-frame events)",
        "value": round(rate, 4),
        "unit": "events/sec",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
