"""Roofline summation of the GAN train step (VERDICT r3 item 4a).

Splits the step built by ``build_train_step`` (training/steps.py:185-242)
into its coherent blocks, compiles each standalone, times it on-chip, and
computes per-block roofline bounds from XLA's own ``cost_analysis()``:

    compute bound = flops / 197e12     (v5e bf16 MXU peak; f32 convs run
                                        as bf16 MXU passes under the
                                        default precision config)
    bandwidth bound = bytes accessed / 819e9   (v5e HBM)
    block bound = max(compute, bandwidth)

Blocks (matching the single-forward step structure):
    g_fwd      generator forward (jax.vjp primal)
    g_bwd      generator pullback  (measured as (fwd+bwd) - fwd)
    d_step     fused fake+real D forward/backward + Adam update (batch 2B)
    g_head     rec loss + adversarial D forward and its d_preds backward
    opt_g      Adam update on generator grads

The summation table is appended to PROFILE.md with --append. Usage:
    python scripts/roofline_train.py [--batch 12] [--reps 20] [--append]
"""

from __future__ import annotations

# Allow running as `python scripts/<name>.py` without installing the package.
import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import functools
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/p2igan_jax_cache"))

H = W = 128
T = 16
BASE = 64
N_GAUGES = 79
PEAK_FLOPS = 197e12
HBM_BW = 819e9


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def _time(compiled, args, reps):
    import jax.numpy as jnp

    out = compiled(*args)
    leaf = [x for x in __import__("jax").tree_util.tree_leaves(out)][0]
    float(jnp.sum(leaf))  # true host sync (tunneled backend)
    t0 = time.time()
    for _ in range(reps):
        out = compiled(*args)
    leaf = [x for x in __import__("jax").tree_util.tree_leaves(out)][0]
    float(jnp.sum(leaf))
    return (time.time() - t0) / reps * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--append", action="store_true")
    ap.add_argument("--out", default="PROFILE.md")
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp
    import optax

    from p2igan_tpu.losses import gan_loss, reconstruction_loss
    from p2igan_tpu.models import P2IDiscriminator, P2IGenerator
    from p2igan_tpu.ops.idw import factored_prepare_full
    from p2igan_tpu.ops.layers import InputBlock
    from p2igan_tpu.training.steps import (TrainState, _disc_apply_factory,
                                           _gen_apply_factory,
                                           build_train_step, make_optimizer)

    print(f"backend={jax.default_backend()}  batch={B}", flush=True)
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

    gen_apply = _gen_apply_factory(gen, prep)
    disc_apply = _disc_apply_factory(disc)
    _gan = functools.partial(gan_loss, loss_type="hinge")

    gv, dv = dict(gen_vars), dict(disc_vars)
    gp, dp = gv.pop("params"), dv.pop("params")
    opt_g_state, opt_d_state = opt_g.init(gp), opt_d.init(dp)

    masks = jnp.asarray(np.broadcast_to(
        mask_flat.reshape(1, 1, H, W, 1), (B, T, H, W, 1)).copy())
    frames = jax.random.uniform(jax.random.key(2), (B, T, H, W, 1))
    masked = frames * masks

    rows = []

    def block(name, fn, *call_args):
        # device-put once: the tunneled backend transfers host args at
        # ~16 MB/s, which would dominate the timing otherwise
        call_args = tuple(jax.device_put(a) for a in call_args)
        c = jax.jit(fn).lower(*call_args).compile()
        ms = _time(c, call_args, args.reps)
        fl, by = _cost(c)
        cb = fl / PEAK_FLOPS * 1e3
        bb = by / HBM_BW * 1e3
        rows.append((name, ms, fl, by, cb, bb))
        print(f"{name:8s} {ms:7.2f} ms   {fl/1e9:8.1f} GF  {by/1e6:8.0f} MB"
              f"   compute {cb:6.2f} ms  bw {bb:6.2f} ms", flush=True)
        return ms

    # ---- block programs (mirroring training/steps.py:185-242) ----------
    def g_fwd(p, masked, masks):
        preds, _ = gen_apply(p, gv, masked, masks, True)
        return preds

    ct = jnp.ones((B, T, H, W, 1), jnp.float32)

    def g_fwd_bwd(p, masked, masks):
        def fwd(pp):
            preds, g_extra = gen_apply(pp, gv, masked, masks, True)
            return preds, g_extra
        preds, vjp, _ = jax.vjp(fwd, p, has_aux=True)
        (g_grads,) = vjp(ct)
        return preds, g_grads

    preds0 = jax.jit(g_fwd).lower(gp, masked, masks).compile()(gp, masked, masks)
    preds0 = jax.block_until_ready(preds0)

    def d_step(preds0, frames, dp, opt_d_state):
        def d_loss_fn(p, extra):
            logits, extra = disc_apply(
                p, extra, jnp.concatenate([preds0, frames], axis=0), True)
            lf, lr = logits[:B], logits[B:]
            return (_gan(lr, True, is_disc=True)
                    + _gan(lf, False, is_disc=True)) * 0.5, extra
        (loss_d, extra), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(dp, dv)
        upd, opt_d_state = opt_d.update(grads, opt_d_state, dp)
        return loss_d, optax.apply_updates(dp, upd), extra, opt_d_state

    def g_head(preds, frames, dp):
        def g_loss_from_preds(preds_in, d_extra):
            rec, parts = reconstruction_loss(preds_in, frames, 0.05)
            logits, d_extra = disc_apply(jax.lax.stop_gradient(dp),
                                         d_extra, preds_in, True)
            adv = _gan(logits, True, is_disc=False) * 0.01
            return rec + adv, (rec, adv)
        (loss, _), dpreds = jax.value_and_grad(
            g_loss_from_preds, has_aux=True)(preds, dv)
        return loss, dpreds

    g_grads0 = jax.jit(lambda p: g_fwd_bwd(p, masked, masks)[1]) \
        .lower(gp).compile()(gp)
    g_grads0 = jax.block_until_ready(g_grads0)

    def opt_g_block(grads, opt_state, p):
        upd, opt_state = opt_g.update(grads, opt_state, p)
        return optax.apply_updates(p, upd), opt_state

    t_fwd = block("g_fwd", g_fwd, gp, masked, masks)
    t_fb = block("g_fwdbwd", g_fwd_bwd, gp, masked, masks)
    t_d = block("d_step", d_step, preds0, frames, dp, opt_d_state)
    t_gh = block("g_head", g_head, preds0, frames, dp)
    t_og = block("opt_g", opt_g_block, g_grads0, opt_g_state, gp)

    # ---- full step reference -------------------------------------------
    state = TrainState(step=np.zeros((), np.int32), gen_params=gp,
                       gen_extra=gv, opt_g=opt_g_state, disc_params=dp,
                       disc_extra=dv, opt_d=opt_d_state)
    step = build_train_step(gen, disc, opt_g, opt_d, use_gan=True,
                            gan_loss_type="hinge", adversarial_weight=0.01,
                            k1_alpha=0.05, donate=False, idw_prepared=prep)
    step_c = step.lower(state, frames, masked, masks).compile()
    st, m = step_c(state, frames, masked, masks)
    float(m["loss"])
    t0 = time.time()
    for _ in range(args.reps):
        st, m = step_c(st, frames, masked, masks)
    float(m["loss"])
    t_step = (time.time() - t0) / args.reps * 1e3
    fl_step, by_step = _cost(step_c)

    block_sum = t_fb + t_d + t_gh + t_og
    # bound sum counts g_fwdbwd (not g_fwd, which is a subset of it)
    bound_sum = sum(max(cb, bb) for (name, _, _, _, cb, bb) in rows
                    if name != "g_fwd")
    lines = [
        "",
        f"### Train-step roofline summation (batch {B}, "
        f"scripts/roofline_train.py)",
        "",
        f"Full step: **{t_step:.1f} ms** ({1e3/t_step:.2f} steps/s); XLA "
        f"cost_analysis {fl_step/1e12:.2f} TFLOP, "
        f"{by_step/1e9:.2f} GB accessed. Per-block standalone programs "
        f"(compute bound = flops/197 TF/s, bw bound = bytes/819 GB/s):",
        "",
        "| block | measured ms | GFLOP | MB accessed | compute-bound ms | "
        "bw-bound ms | roofline ms | x-of-bound |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, ms, fl, by, cb, bb in rows:
        bound = max(cb, bb)
        lines.append(f"| {name} | {ms:.2f} | {fl/1e9:.1f} | {by/1e6:.0f} | "
                     f"{cb:.2f} | {bb:.2f} | {bound:.2f} | "
                     f"{ms/bound if bound else float('nan'):.2f}x |")
    lines += [
        "",
        f"Block sum (g_fwdbwd + d_step + g_head + opt_g) = "
        f"**{block_sum:.1f} ms** vs full step {t_step:.1f} ms "
        f"(fusion across block boundaries accounts for the difference). "
        f"Roofline sum = **{bound_sum:.1f} ms** -> the step runs at "
        f"{bound_sum / t_step * 100:.0f}% of its summed per-block bound.",
    ]
    text = "\n".join(lines)
    print(text)
    if args.append:
        with open(args.out, "a") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
