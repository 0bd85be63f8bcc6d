"""On-chip sweep of GAN train-step knobs (donation, batch ladder).

Round-2 measured the step ladder at donate=False (bench.py's AOT path).
Buffer donation lets XLA alias the params/opt-state inputs to their
updated outputs, removing any defensive copies and freeing HBM headroom
(batch 192 failed to compile at round 2 without it). This measures:

  - donate False vs True at the config batch (12)
  - a batch ladder at the winning setting (12, 48, 128, 192)

Usage: python scripts/sweep_train.py [--reps 20] [--batches 12,48,128,192]
Each timed region ends with a scalar host fetch (tunneled backend).
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
BASE = 64
N_GAUGES = 79


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--batches", type=str, default="12,48,128,192")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from p2igan_tpu.models import P2IDiscriminator, P2IGenerator
    from p2igan_tpu.ops.idw import factored_prepare_full
    from p2igan_tpu.ops.layers import InputBlock
    from p2igan_tpu.training.steps import (TrainState, build_train_step,
                                           make_optimizer)

    print(f"backend={jax.default_backend()}", flush=True)

    gen = P2IGenerator(H=H, W=W, length=T, base_channels=BASE,
                       idw_max_points=1280, idw_chunk=16384,
                       idw_factored=True, idw_shared_batch_mask=True)
    disc = P2IDiscriminator(in_channels=T)
    rng = np.random.default_rng(1)
    mask_flat = np.zeros((H * W,), np.float32)
    mask_flat[rng.choice(H * W, N_GAUGES, replace=False)] = 1.0

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        masks1 = jnp.asarray(np.broadcast_to(
            mask_flat.reshape(1, 1, H, W, 1), (1, T, H, W, 1)).copy())
        gen_vars = dict(gen.init(jax.random.key(0),
                                 jnp.zeros((1, T, H, W, 1), jnp.float32),
                                 masks1))
        disc_vars = dict(disc.init(jax.random.key(1),
                                   jnp.zeros((1, T, H, W, 1), jnp.float32)))
        budget = InputBlock.gauge_budget(gen.idw_max_points, gen.length)
        prep = factored_prepare_full(jnp.asarray(mask_flat.reshape(H, W)),
                                     budget, k=4, use_pallas=False)
    gen_vars = jax.device_get(gen_vars)
    disc_vars = jax.device_get(disc_vars)
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
        sps = reps / (time.time() - t0)
        return sps, compile_s

    # hoisted vs inline gauge selection at the config batch (VERDICT r2 #3):
    # inline re-runs the gauge top-k (and its backward) in every step
    for use_prep in (True, False):
        try:
            sps, cs = run(12, False, args.reps, use_prep=use_prep)
            tag = "hoisted" if use_prep else "inline "
            print(f"batch=12  idw={tag}  {sps:6.2f} steps/s  "
                  f"{sps * 12:7.1f} samples/s  (compile {cs:.0f}s)", flush=True)
        except Exception as e:
            print(f"batch=12 idw_prep={use_prep} FAILED: "
                  f"{type(e).__name__}: {e}"[:200], flush=True)

    for donate in (True,):
        try:
            sps, cs = run(12, donate, args.reps)
            print(f"batch=12  donate={donate}  {sps:6.2f} steps/s  "
                  f"{sps * 12:7.1f} samples/s  (compile {cs:.0f}s)", flush=True)
        except Exception as e:
            print(f"batch=12 donate={donate} FAILED: "
                  f"{type(e).__name__}: {e}"[:200], flush=True)

    for batch in [int(b) for b in args.batches.split(",") if int(b) != 12]:
        reps = max(4, args.reps * 12 // batch)
        for donate in (True,):
            try:
                sps, cs = run(batch, donate, reps)
                print(f"batch={batch}  donate={donate}  {sps:6.2f} steps/s  "
                      f"{sps * batch:7.1f} samples/s  (compile {cs:.0f}s)",
                      flush=True)
            except Exception as e:
                print(f"batch={batch} donate={donate} FAILED: "
                      f"{type(e).__name__}: {e}"[:200], flush=True)


if __name__ == "__main__":
    main()
