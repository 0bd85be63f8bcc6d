"""Profile the inference hot path on the real chip (VERDICT r1 item 7).

Produces two kinds of measured evidence (committed to PROFILE.md):
1. a jax.profiler trace of the compiled event-reconstruction program, with
   device-time aggregated per XLA op category parsed from the xplane proto;
2. wall-clock stage decomposition: attention stack, factored_prepare,
   factored_apply (IDW combine), full generator forward, full event program
   — each jitted and timed separately at bench shapes.

Usage: python scripts/profile_infer.py [--out PROFILE.md --trace-dir /tmp/p2i_trace]
"""

from __future__ import annotations

# Allow running as `python scripts/<name>.py` without installing the package.
import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import glob
import gzip
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

EVENT_T = 64
H = W = 128
T = 16
WB = 8  # windows per generator call, as in bench.py


def _timeit(fn, *args, reps=20) -> float:
    import jax

    jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def stage_timings():
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.inference.driver import SlidingWindowReconstructor
    from p2igan_tpu.models import P2IGenerator
    from p2igan_tpu.ops.idw import factored_apply, factored_prepare

    gen = P2IGenerator(H=H, W=W, length=T, base_channels=64,
                       idw_max_points=1280, idw_chunk=16384, idw_factored=True,
                       idw_shared_batch_mask=True)
    rng = np.random.default_rng(0)
    mask_flat = np.zeros((H * W,), np.float32)
    mask_flat[rng.choice(H * W, 79, replace=False)] = 1.0
    gauge = np.broadcast_to(mask_flat.reshape(1, 1, H, W, 1),
                            (WB, T, H, W, 1)).astype(np.float32)
    masked = np.asarray(
        rng.random((WB, T, H, W, 1)), np.float32) * gauge
    variables = gen.init(jax.random.key(0), jnp.asarray(masked),
                         jnp.asarray(gauge))
    # serving path: folded DOConv kernels, as bench.py / run_inference
    gen, variables = gen.fold_for_inference(variables)
    masked_d = jnp.asarray(masked)
    gauge_d = jnp.asarray(gauge)

    rows = {}

    # full generator forward (window batch of 8)
    fwd = jax.jit(lambda m, k: gen.apply(variables, m, k))
    rows["generator fwd (8 windows)"] = _timeit(fwd, masked_d, gauge_d)

    # attention stack alone
    from p2igan_tpu.ops.layers import InputBlock

    att_params = {"params": variables["params"]["input"]}
    ib = InputBlock(depth=2, k=4, max_points=1280, factored=True,
                    shared_batch_mask=True)

    def input_block(m, k):
        x = jnp.transpose(m, (0, 2, 3, 1, 4)).reshape(WB, H, W, T)
        mk = jnp.transpose(k, (0, 2, 3, 1, 4)).reshape(WB, H, W, T)
        return ib.apply(att_params, x, mk)

    rows["InputBlock total (att + prepare + combine)"] = _timeit(
        jax.jit(input_block), masked_d, gauge_d)

    # factored_prepare alone (per event program: runs once)
    mask_xy = jnp.asarray(mask_flat.reshape(H, W))
    prep_fn = jax.jit(lambda m: factored_prepare(m, 128, k=4))
    rows["factored_prepare (gauge top-k)"] = _timeit(prep_fn, mask_xy)

    # factored_apply (combine kernel) for 8 windows
    gd2, gpix = jax.block_until_ready(prep_fn(mask_xy))
    vals = jnp.asarray(rng.random((WB, T, H, W)), jnp.float32)
    comb = jax.jit(lambda v: jax.vmap(
        lambda x: factored_apply(gd2, gpix, x, k=4))(v))
    rows["factored_apply (IDW combine, 8 windows)"] = _timeit(comb, vals)

    # gauge-table combine (the shipping path: candidates from the (D, G) table)
    from p2igan_tpu.ops.idw import factored_apply_gauges, factored_prepare_full

    prep_full = jax.jit(lambda m: factored_prepare_full(m, 128, k=4))
    gd2f, gself, gpixf = jax.block_until_ready(prep_full(mask_xy))
    gvals = jnp.asarray(rng.random((WB, T, 128)), jnp.float32)
    combg = jax.jit(lambda v: jax.vmap(lambda x: factored_apply_gauges(
        gd2f, gself, x, (H, W), k=4))(v))
    rows["factored_apply_gauges (table combine, 8 windows)"] = _timeit(combg, gvals)

    # full event program
    recon = SlidingWindowReconstructor(gen, variables, stride=16, overlap=12,
                                       window_batch=WB, output_scale=255.0,
                                       t_bucket=EVENT_T)
    fn = recon.compiled_fn(EVENT_T)
    ev_masked = jnp.asarray(np.asarray(
        rng.random((EVENT_T, H, W, 1)), np.float32)
        * mask_flat.reshape(1, H, W, 1))
    ev_mask = jnp.asarray(np.broadcast_to(
        mask_flat.reshape(1, H, W, 1), (EVENT_T, H, W, 1)).astype(np.float32))
    rows["event program (16 windows, 2 chunks)"] = _timeit(fn, ev_masked, ev_mask)

    return rows, (fn, ev_masked, ev_mask)


def capture_trace(trace_dir: str, fn, *args, reps=5):
    import jax

    jax.block_until_ready(fn(*args))
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)


def _op_key(name: str) -> str:
    """Collapse an XLA op instance name to its family, e.g.
    '%convolution_add_fusion.47 = bf16[...' -> 'convolution_add_fusion'."""
    import re

    head = name.lstrip("%").split(" ", 1)[0]
    return re.sub(r"[.\d]+$", "", head)


def parse_xplane(trace_dir: str, top_n: int = 20):
    """Aggregate device XLA-Ops line durations by op family (tsl xplane)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        return None, "no xplane.pb found"
    raw = Path(paths[-1]).read_bytes()
    try:
        raw = gzip.decompress(raw)
    except OSError:
        pass
    space = xplane_pb2.XSpace()
    space.ParseFromString(raw)

    totals = defaultdict(float)
    device_total = 0.0
    for plane in space.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":  # module/overlay lines double-count
                continue
            for ev in line.events:
                dur = ev.duration_ps / 1e12
                totals[_op_key(meta.get(ev.metadata_id, "?"))] += dur
                device_total += dur
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]
    return (device_total, ranked), None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PROFILE.md")
    ap.add_argument("--trace-dir", default="/tmp/p2i_trace")
    args = ap.parse_args()

    import jax

    rows, (fn, ev_m, ev_k) = stage_timings()
    capture_trace(args.trace_dir, fn, ev_m, ev_k)
    parsed, err = parse_xplane(args.trace_dir)

    lines = ["# PROFILE — inference hot path (measured on TPU)", "",
             f"Backend: {jax.default_backend()}, device: {jax.devices()[0]}", "",
             "## Stage wall-clock (jitted separately, mean of 20 reps)", "",
             "| stage | ms |", "|---|---|"]
    ev_ms = rows["event program (16 windows, 2 chunks)"] * 1e3
    for k, v in rows.items():
        lines.append(f"| {k} | {v * 1e3:.2f} |")
    lines += ["", f"Event program throughput implied: {1e3 / ev_ms:.1f} events/sec", ""]

    if parsed:
        device_total, ranked = parsed
        lines += ["## Device time by XLA op family (jax.profiler trace, 5 event programs)",
                  "", "| op family | ms (5 events) | % of device time |", "|---|---|---|"]
        for name, dur in ranked:
            nm = name.replace("|", "\\|")[:90]
            lines.append(f"| {nm} | {dur * 1e3:.2f} | {100 * dur / device_total:.1f} |")
        lines += ["", f"Total device time in trace: {device_total * 1e3:.1f} ms "
                      f"(5 reps of the event program)"]
    else:
        lines += [f"(xplane parse failed: {err})"]

    Path(args.out).write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
