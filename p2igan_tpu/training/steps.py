"""Jitted GAN train/eval steps with data-parallel sharding.

TPU-native re-design of the reference per-batch loop
(``scripts/train.py:228-367``): the discriminator step, generator step, and
loss bookkeeping compile into ONE XLA program per batch shape. Batches are
sharded over the mesh ``data`` axis, parameters are replicated, and gradient
all-reduce emerges as XLA collectives from the sharding annotations (riding
ICI) — no hand-written communication.

Semantics preserved from the reference ordering:
  1. preds = G(masked, masks)  — ONE forward per batch (train.py:243); the
     D step consumes stop_gradient(preds) (== preds.detach(), train.py:264)
  2. D step on (stop_gradient(preds), frames), hinge/nsgan/lsgan, 0.5*(r+f)
  3. D params updated, THEN generator adversarial logits use the updated D
     (train.py:264-309)
  4. G step: rec_loss + adversarial_weight * gan(D(preds), real=True)
Each training D forward advances the spectral-norm power iteration once
(threaded state replaces torch's in-place buffer mutation); torch's
requires_grad freezing becomes structural — G grads are taken only w.r.t.
generator params.

The single forward is realized with ``jax.vjp``: the generator runs once,
its pullback is stored, the G loss (+ its gradient w.r.t. ``preds``) is
computed from the cached ``preds``, and generator parameter gradients are the
pullback of ``dL/dpreds``. This matches torch autograd's cost shape — the
round-1 two-forward variant re-ran the full generator (IDW InputBlock ~70%
of forward cost) inside ``value_and_grad`` and is kept only for the
equivalence test (``single_forward=False``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..losses import gan_loss, reconstruction_loss


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    gen_params: Any
    gen_extra: Any          # e.g. batch_stats for the simple model
    opt_g: Any
    disc_params: Any = None
    disc_extra: Any = None  # spectral power-iteration state / batch_stats
    opt_d: Any = None


class _AdamNoMuState(flax.struct.PyTreeNode):
    count: jnp.ndarray
    nu: Any


def _scale_by_adam_nomu(b2: float, eps: float = 1e-8) -> optax.GradientTransformation:
    """``optax.scale_by_adam(b1=0)`` without the first-moment buffer.

    With ``b1 == 0`` Adam's ``mu`` is identically the incoming gradient
    (``mu = (1-b1)*g + b1*mu = g``; bias correction ``1 - 0**t = 1``), yet
    optax still allocates it and pays a param-sized HBM read+write per step.
    Dropping it cuts the optimizer update from 7 to 5 param-sized passes
    (read g/nu/p, write nu/p) and one param-sized state buffer — the
    round-4 train roofline measured ``opt_g`` at 2.06x its bandwidth bound
    (PROFILE.md). The arithmetic below mirrors optax's helpers exactly, so
    trajectories are bit-identical to ``optax.adam(b1=0)``
    (tests/test_training.py::test_adam_nomu_matches_optax)."""

    def init_fn(params):
        return _AdamNoMuState(count=jnp.zeros([], jnp.int32),
                              nu=optax.tree.zeros_like(params))

    def update_fn(updates, state, params=None):
        del params
        nu = optax.tree.update_moment_per_elem_norm(updates, state.nu, b2, 2)
        count_inc = optax.safe_increment(state.count)
        nu_hat = optax.tree.bias_correction(nu, b2, count_inc)
        updates = jax.tree.map(
            lambda g, v: None if g is None else g / (jnp.sqrt(v) + eps),
            updates, nu_hat, is_leaf=lambda x: x is None)
        return updates, _AdamNoMuState(count=count_inc, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(opt_cfg: Dict[str, Any]) -> optax.GradientTransformation:
    """Adam with the reference defaults (train.py:125-136): betas (0.0, 0.99).

    ``beta1 == 0`` (every shipped config) takes the mu-free fast path; any
    nonzero ``beta1`` falls back to stock ``optax.adam``."""
    lr = opt_cfg.get("lr", 1e-4)
    b1 = opt_cfg.get("beta1", 0.0)
    b2 = opt_cfg.get("beta2", 0.99)
    # eps threads through BOTH branches so the fast path and the optax.adam
    # fallback can never diverge if a config ever sets it (ADVICE r4).
    eps = opt_cfg.get("eps", 1e-8)
    if b1 == 0.0:
        return optax.chain(_scale_by_adam_nomu(b2, eps=eps),
                           optax.scale_by_learning_rate(lr))
    return optax.adam(learning_rate=lr, b1=b1, b2=b2, eps=eps)


def _gen_apply_factory(gen, idw_prepared=None) -> Callable:
    """Normalize generator apply across model families.

    Masks broadcast against ``masked`` here, INSIDE the step jit: the raw
    device-decode pipeline ships frame-constant sti/stis masks as
    ``(B, 1, H, W, C)`` and XLA fuses the expansion into the generator's
    first consumers (a no-op for full-shape masks).

    ``idw_prepared``: hoisted gauge-selection tables from
    ``P2IGenerator.prepare_idw`` for the factored shared-mask IDW path
    (stis gauge configs, reference layer.py:307-361 semantics). The tables
    are a constant of the mask file, so computing them once per RUN instead
    of inside every compiled step removes the per-step gauge top-k and its
    backward from the autodiff graph (VERDICT r2 item 3; serving already
    hoists, inference/driver.py)."""
    from ..models import SimpleGenerator

    if isinstance(gen, SimpleGenerator):
        def apply_fn(params, extra, masked, masks, train):
            masks = jnp.broadcast_to(masks, masked.shape)
            variables = {"params": params, **extra}
            if train:
                preds, upd = gen.apply(variables, masked, masks, train=True,
                                       mutable=["batch_stats"])
                return preds, dict(upd)
            return gen.apply(variables, masked, masks, train=False), extra
    elif idw_prepared is not None:
        prep = jax.tree_util.tree_map(jax.lax.stop_gradient, idw_prepared)

        def apply_fn(params, extra, masked, masks, train):
            masks = jnp.broadcast_to(masks, masked.shape)
            return gen.apply({"params": params, **extra}, masked, masks,
                             idw_prepared=prep), extra
    else:
        def apply_fn(params, extra, masked, masks, train):
            masks = jnp.broadcast_to(masks, masked.shape)
            return gen.apply({"params": params, **extra}, masked, masks), extra
    return apply_fn


def _disc_apply_factory(disc) -> Callable:
    from ..models import SimpleDiscriminator

    if isinstance(disc, SimpleDiscriminator):
        def apply_fn(params, extra, x, update_stats):
            variables = {"params": params, **extra}
            if update_stats:
                logits, upd = disc.apply(variables, x, train=True,
                                         mutable=["batch_stats"])
                return logits, dict(upd)
            return disc.apply(variables, x, train=False), extra
    else:
        def apply_fn(params, extra, x, update_stats):
            variables = {"params": params, **extra}
            if update_stats:
                logits, upd = disc.apply(variables, x, update_stats=True,
                                         mutable=["spectral"])
                return logits, dict(upd)
            return disc.apply(variables, x, update_stats=False), extra
    return apply_fn


def build_train_step(
    gen,
    disc,
    opt_g: optax.GradientTransformation,
    opt_d: Optional[optax.GradientTransformation],
    *,
    use_gan: bool,
    gan_loss_type: str = "hinge",
    adversarial_weight: float = 0.01,
    k1_alpha: float = 0.0,
    gan_real_label: float = 1.0,
    gan_fake_label: float = 0.0,
    donate: bool = True,
    single_forward: bool = True,
    fused_disc_forward: bool = True,
    idw_prepared=None,
) -> Callable[[TrainState, jax.Array, jax.Array, jax.Array],
              Tuple[TrainState, Dict[str, jax.Array]]]:
    gen_apply = _gen_apply_factory(gen, idw_prepared)
    disc_apply = _disc_apply_factory(disc) if disc is not None else None
    _gan = functools.partial(gan_loss, loss_type=gan_loss_type,
                             target_real_label=gan_real_label,
                             target_fake_label=gan_fake_label)

    # Fused D step: fake+real concatenated into ONE forward (conv on the
    # stacked batch == stacked conv outputs, verified exactly in
    # tests/test_training.py), so XLA builds one fwd/bwd chain at batch 2B
    # instead of two at batch B. Trade-off vs the reference cadence
    # (train.py:270-276, one power iteration per forward): the spectral-norm
    # u vectors advance once per D step instead of twice, and both halves see
    # the same u. Power iteration converges geometrically, so the estimate
    # trails by at most one step; `fused_disc_forward=False` restores the
    # reference's exact two-forward cadence. Fused is skipped for
    # BatchNorm discriminators (SimpleDiscriminator), where concatenation
    # would mix fake/real batch statistics.
    from ..models import SimpleDiscriminator
    fuse_d = fused_disc_forward and not isinstance(disc, SimpleDiscriminator)

    def _d_step(preds0, frames, disc_params, disc_extra, opt_d_state):
        """Discriminator update on detached preds (train.py:264-295)."""
        def d_loss_fn(p, extra):
            if fuse_d:
                b = preds0.shape[0]
                logits, extra = disc_apply(
                    p, extra, jnp.concatenate([preds0, frames], axis=0), True)
                logits_fake, logits_real = logits[:b], logits[b:]
            else:
                logits_fake, extra = disc_apply(p, extra, preds0, True)
                logits_real, extra = disc_apply(p, extra, frames, True)
            loss_d = (_gan(logits_real, True, is_disc=True)
                      + _gan(logits_fake, False, is_disc=True)) * 0.5
            return loss_d, extra

        (loss_d, disc_extra), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(disc_params, disc_extra)
        d_updates, opt_d_state = opt_d.update(d_grads, opt_d_state, disc_params)
        disc_params = optax.apply_updates(disc_params, d_updates)
        return loss_d, disc_params, disc_extra, opt_d_state

    def step(state: TrainState, frames, masked, masks):
        metrics: Dict[str, jax.Array] = {}

        # ---- forward G ONCE, keeping the pullback ------------------------
        def fwd(p):
            preds, g_extra = gen_apply(p, state.gen_extra, masked, masks,
                                       train=True)
            return preds, g_extra

        preds, gen_vjp, g_extra = jax.vjp(fwd, state.gen_params, has_aux=True)
        preds0 = jax.lax.stop_gradient(preds)

        disc_params = state.disc_params
        disc_extra = state.disc_extra
        opt_d_state = state.opt_d

        if use_gan and disc is not None:
            loss_d, disc_params, disc_extra, opt_d_state = _d_step(
                preds0, frames, disc_params, disc_extra, opt_d_state)
            metrics["dis_loss"] = loss_d

        # ---- G loss from cached preds (uses the UPDATED discriminator) ---
        def g_loss_from_preds(preds_in, d_extra):
            rec, parts = reconstruction_loss(preds_in, frames, k1_alpha)
            loss = rec
            adv = jnp.asarray(0.0, rec.dtype)
            if use_gan and disc is not None:
                logits, d_extra = disc_apply(jax.lax.stop_gradient(disc_params),
                                             d_extra, preds_in, True)
                adv = _gan(logits, True, is_disc=False) * adversarial_weight
                loss = loss + adv
            aux = {"rec_loss": rec, "adv_loss": adv, "pool": parts["pool"],
                   "reg": parts["reg"], "d_extra": d_extra}
            return loss, aux

        (loss_g, aux), dpreds = jax.value_and_grad(
            g_loss_from_preds, has_aux=True)(preds, disc_extra)
        (g_grads,) = gen_vjp(dpreds)
        g_updates, opt_g_state = opt_g.update(g_grads, state.opt_g, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        metrics.update({
            "loss": loss_g,
            "rec_loss": aux["rec_loss"],
            "adv_loss": aux["adv_loss"],
            "pool": aux["pool"],
            "reg": aux["reg"],
        })
        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            gen_extra=g_extra,
            opt_g=opt_g_state,
            disc_params=disc_params,
            disc_extra=aux["d_extra"] if (use_gan and disc is not None) else disc_extra,
            opt_d=opt_d_state,
        )
        return new_state, metrics

    def step_twoforward(state: TrainState, frames, masked, masks):
        # Round-1 shape, kept for the equivalence test: G runs twice
        # (train=False for the D step, train=True inside value_and_grad).
        metrics: Dict[str, jax.Array] = {}
        preds0, _ = gen_apply(state.gen_params, state.gen_extra, masked, masks,
                              train=False)
        preds0 = jax.lax.stop_gradient(preds0)

        disc_params = state.disc_params
        disc_extra = state.disc_extra
        opt_d_state = state.opt_d
        if use_gan and disc is not None:
            loss_d, disc_params, disc_extra, opt_d_state = _d_step(
                preds0, frames, disc_params, disc_extra, opt_d_state)
            metrics["dis_loss"] = loss_d

        def g_loss_fn(p, g_extra, d_extra):
            preds, g_extra = gen_apply(p, g_extra, masked, masks, train=True)
            rec, parts = reconstruction_loss(preds, frames, k1_alpha)
            loss = rec
            adv = jnp.asarray(0.0, rec.dtype)
            if use_gan and disc is not None:
                logits, d_extra = disc_apply(jax.lax.stop_gradient(disc_params),
                                             d_extra, preds, True)
                adv = _gan(logits, True, is_disc=False) * adversarial_weight
                loss = loss + adv
            aux = {"rec_loss": rec, "adv_loss": adv, "pool": parts["pool"],
                   "reg": parts["reg"], "g_extra": g_extra, "d_extra": d_extra}
            return loss, aux

        (loss_g, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.gen_params, state.gen_extra, disc_extra)
        g_updates, opt_g_state = opt_g.update(g_grads, state.opt_g, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)
        metrics.update({
            "loss": loss_g, "rec_loss": aux["rec_loss"],
            "adv_loss": aux["adv_loss"], "pool": aux["pool"], "reg": aux["reg"],
        })
        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            gen_extra=aux["g_extra"],
            opt_g=opt_g_state,
            disc_params=disc_params,
            disc_extra=aux["d_extra"] if (use_gan and disc is not None) else disc_extra,
            opt_d=opt_d_state,
        )
        return new_state, metrics

    fn = step if single_forward else step_twoforward
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def build_eval_step(gen, *, k1_alpha: float = 0.0, idw_prepared=None) -> Callable:
    """Validation reconstruction loss (reference _evaluate_rec_loss)."""
    gen_apply = _gen_apply_factory(gen, idw_prepared)

    @jax.jit
    def step(state: TrainState, frames, masked, masks):
        preds, _ = gen_apply(state.gen_params, state.gen_extra, masked, masks,
                             train=False)
        loss, _ = reconstruction_loss(preds, frames, k1_alpha)
        return loss

    return step


def build_predict_fn(gen, idw_prepared=None) -> Callable:
    gen_apply = _gen_apply_factory(gen, idw_prepared)

    @jax.jit
    def predict(state: TrainState, masked, masks):
        preds, _ = gen_apply(state.gen_params, state.gen_extra, masked, masks,
                             train=False)
        return preds

    return predict
