"""Profile the GAN train step on the real chip (batch 12, 128^2x16 hinge).

Captures a jax.profiler trace of build_train_step's compiled program and
aggregates device XLA-op time by family (same xplane parsing as
scripts/profile_infer.py). Appends the summary to PROFILE.md.
"""

from __future__ import annotations

# Allow running as `python scripts/<name>.py` without installing the package.
import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import time
from pathlib import Path

import numpy as np

from profile_infer import parse_xplane  # same directory

H = W = 128
T = 16
BATCH = 12


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PROFILE.md")
    ap.add_argument("--trace-dir", default="/tmp/p2i_train_trace")
    ap.add_argument("--append", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from p2igan_tpu.models import P2IDiscriminator, P2IGenerator
    from p2igan_tpu.training.steps import (TrainState, build_train_step,
                                           make_optimizer)

    rng = np.random.default_rng(1)
    mask_flat = np.zeros((H * W,), np.float32)
    mask_flat[rng.choice(H * W, 79, replace=False)] = 1.0
    masks = jnp.asarray(np.broadcast_to(
        mask_flat.reshape(1, 1, H, W, 1), (BATCH, T, H, W, 1)).astype(np.float32))
    frames = jax.random.uniform(jax.random.key(2), (BATCH, T, H, W, 1))
    masked = frames * masks

    gen = P2IGenerator(H=H, W=W, length=T, base_channels=64,
                       idw_max_points=1280, idw_chunk=16384, idw_factored=True,
                       idw_shared_batch_mask=True)
    disc = P2IDiscriminator(in_channels=T)
    gen_vars = dict(gen.init(jax.random.key(0), masked, masks))
    disc_vars = dict(disc.init(jax.random.key(1), frames))
    opt_g, opt_d = make_optimizer({"lr": 1e-4}), make_optimizer({"lr": 1e-4})
    gp, dp = gen_vars.pop("params"), disc_vars.pop("params")
    state = TrainState(step=jnp.zeros((), jnp.int32), gen_params=gp,
                       gen_extra=gen_vars, opt_g=opt_g.init(gp),
                       disc_params=dp, disc_extra=disc_vars,
                       opt_d=opt_d.init(dp))
    step_fn = build_train_step(gen, disc, opt_g, opt_d, use_gan=True,
                               gan_loss_type="hinge", adversarial_weight=0.01,
                               k1_alpha=0.05, donate=False)

    # sync discipline: on the tunneled backend block_until_ready can return
    # before the device finishes — end every timed region with a scalar host
    # fetch (steps chain through `state`, so the last loss proves them all)
    state, metrics = step_fn(state, frames, masked, masks)
    float(metrics["loss"])
    t0 = time.time()
    for _ in range(5):
        state, metrics = step_fn(state, frames, masked, masks)
    float(metrics["loss"])
    ms = (time.time() - t0) / 5 * 1e3

    with jax.profiler.trace(args.trace_dir):
        for _ in range(3):
            state, metrics = step_fn(state, frames, masked, masks)
        # scalar fetch, not block_until_ready: the trace must stay open
        # until the device actually finishes the profiled steps
        float(metrics["loss"])

    parsed, err = parse_xplane(args.trace_dir)
    lines = ["", "## GAN train step (batch 12, 128^2x16, hinge) — device time",
             "", f"Step wall-clock: {ms:.1f} ms ({1e3 / ms:.2f} steps/sec)", ""]
    if parsed:
        device_total, ranked = parsed
        lines += ["| op family | ms (3 steps) | % of device time |", "|---|---|---|"]
        for name, dur in ranked[:16]:
            lines.append(f"| {name[:90]} | {dur * 1e3:.2f} | "
                         f"{100 * dur / device_total:.1f} |")
    else:
        lines.append(f"(xplane parse failed: {err})")

    out = Path(args.out)
    # default overwrites (matching profile_infer.py); --append accumulates
    text = out.read_text() if args.append and out.exists() else ""
    out.write_text(text + "\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
