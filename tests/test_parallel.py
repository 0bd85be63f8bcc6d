"""Multi-device paths on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p2igan_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                      pad_to_multiple, replicated_sharding)


def test_mesh_covers_devices():
    mesh = create_mesh()
    assert int(np.prod(mesh.devices.shape)) == len(jax.devices())
    assert mesh.axis_names == ("data",)


def test_pad_to_multiple():
    x = np.arange(10, dtype=np.float32).reshape(5, 2)
    padded, n = pad_to_multiple(x, 4)
    assert padded.shape == (8, 2) and n == 5
    np.testing.assert_array_equal(padded[5:], np.broadcast_to(x[-1], (3, 2)))


@pytest.mark.slow
def test_sharded_train_step_matches_single_device(rng):
    """Data-parallel GAN step over 8 devices == single-device step."""
    from p2igan_tpu.models import P2IDiscriminator, P2IGenerator
    from p2igan_tpu.training.steps import TrainState, build_train_step, make_optimizer

    t, hw = 4, 16
    gen = P2IGenerator(H=hw, W=hw, length=t, num_res=1, base_channels=16,
                       idw_max_points=128, idw_chunk=256)
    disc = P2IDiscriminator(in_channels=t)
    b = 8
    frames = jnp.asarray(rng.random((b, t, hw, hw, 1)).astype(np.float32))
    masks = jnp.asarray((rng.random((b, t, hw, hw, 1)) < 0.2).astype(np.float32))
    masked = frames * masks

    gen_vars = dict(gen.init(jax.random.key(0), masked, masks))
    disc_vars = dict(disc.init(jax.random.key(1), frames))
    opt_g, opt_d = make_optimizer({"lr": 1e-3}), make_optimizer({"lr": 1e-3})
    gp, dp = gen_vars.pop("params"), disc_vars.pop("params")

    def fresh_state():
        return TrainState(step=jnp.zeros((), jnp.int32), gen_params=gp,
                          gen_extra=gen_vars, opt_g=opt_g.init(gp),
                          disc_params=dp, disc_extra=disc_vars,
                          opt_d=opt_d.init(dp))

    step = build_train_step(gen, disc, opt_g, opt_d, use_gan=True,
                            k1_alpha=0.05, donate=False)

    # single device
    s1, m1 = step(fresh_state(), frames, masked, masks)

    # 8-device data parallel
    mesh = create_mesh()
    repl = replicated_sharding(mesh)
    sh = batch_sharding(mesh)
    state = jax.device_put(fresh_state(), repl)
    fr, mk, ms = (jax.device_put(x, sh) for x in (frames, masked, masks))
    s8, m8 = step(state, fr, mk, ms)

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-4
    assert abs(float(m1["dis_loss"]) - float(m8["dis_loss"])) < 1e-4
    leaf1 = jax.tree_util.tree_leaves(s1.gen_params)[0]
    leaf8 = jax.tree_util.tree_leaves(s8.gen_params)[0]
    np.testing.assert_allclose(np.asarray(leaf1), np.asarray(leaf8), atol=1e-5)


def test_metric_state_psum_reduction(rng):
    """Sharded metric accumulators reduce with psum to the global counts
    (activating the reference's dormant dist_reduce_fx semantics)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from p2igan_tpu.metrics import metric as M

    mesh = create_mesh()
    n_dev = len(jax.devices())
    preds = rng.random((n_dev, 2, 16, 16)).astype(np.float32)
    target = rng.random((n_dev, 2, 16, 16)).astype(np.float32)
    thresholds = (0.5, 2.0)

    def local_update(p, t):
        st = M.categorical_metrics_init(len(thresholds))
        st = M.categorical_metrics_update(st, p[0], t[0], thresholds)
        return M.RainfallMetricSuite.psum_state(st, "data")

    f = shard_map(local_update, mesh=mesh, in_specs=(P("data"), P("data")),
                  out_specs=P())
    reduced = f(jnp.asarray(preds), jnp.asarray(target))

    st_all = M.categorical_metrics_init(len(thresholds))
    for i in range(n_dev):
        st_all = M.categorical_metrics_update(st_all, jnp.asarray(preds[i]),
                                              jnp.asarray(target[i]), thresholds)
    for k in st_all:
        np.testing.assert_allclose(np.asarray(st_all[k]), np.asarray(reduced[k]),
                                   rtol=1e-6)


@pytest.mark.slow
def test_window_sharded_inference_matches_single_device(rng):
    """Window-parallel (CP-analogue) reconstruction == sequential result."""
    from p2igan_tpu.inference.driver import SlidingWindowReconstructor
    from p2igan_tpu.models import SimpleGenerator

    gen = SimpleGenerator(base_channels=4)
    masked0 = np.zeros((1, 4, 16, 16, 1), np.float32)
    vars_ = gen.init(jax.random.key(0), masked0, masked0)
    recon = SlidingWindowReconstructor(gen, vars_, stride=8, overlap=4,
                                       window_batch=2, t_bucket=8)
    T = 20
    masked = rng.random((T, 16, 16, 1)).astype(np.float32)
    masks = (rng.random((T, 16, 16, 1)) < 0.3).astype(np.float32)
    ref = recon(masked, masks)
    mesh = create_mesh()
    out = recon.sharded(masked, masks, mesh)
    np.testing.assert_allclose(ref, out, atol=2e-3, rtol=1e-4)


@pytest.mark.slow
def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


@pytest.mark.slow
def test_sharded_batch_matches_single_device():
    """Event+window-parallel batch reconstruction over the 8-device mesh
    equals per-event single-device reconstruction."""
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.inference.driver import SlidingWindowReconstructor
    from p2igan_tpu.models import P2IGenerator
    from p2igan_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(3)
    hw, t, ev_t = 16, 4, 8
    gen = P2IGenerator(H=hw, W=hw, length=t, num_res=1, base_channels=16,
                       idw_max_points=128, idw_chunk=256,
                       idw_factored=True, idw_shared_batch_mask=True)
    flat = np.zeros((hw * hw,), np.float32)
    flat[rng.choice(hw * hw, 11, replace=False)] = 1.0
    masks = np.broadcast_to(flat.reshape(1, 1, hw, hw, 1),
                            (2, ev_t, hw, hw, 1)).astype(np.float32)
    frames = rng.random((2, ev_t, hw, hw, 1)).astype(np.float32)
    masked = frames * masks
    variables = gen.init(jax.random.key(0), jnp.asarray(masked[:, :t]),
                         jnp.asarray(masks[:, :t]))

    recon = SlidingWindowReconstructor(gen, variables, stride=t, overlap=1,
                                       window_batch=2, t_bucket=ev_t)
    want = np.stack([recon(masked[e], masks[e]) for e in range(2)])
    mesh = create_mesh(("data",))
    got = recon.sharded_batch(masked, masks, mesh)
    np.testing.assert_allclose(got, want, atol=1e-3)

    # differing per-event masks: the flattened program would hoist event 0's
    # gauge selection for both events; the guard must route through per-event
    # sharded programs so each event keeps its own selection
    flat2 = np.zeros((hw * hw,), np.float32)
    flat2[rng.choice(hw * hw, 11, replace=False)] = 1.0
    masks2 = masks.copy()
    masks2[1] = np.broadcast_to(flat2.reshape(1, hw, hw, 1),
                                (ev_t, hw, hw, 1))
    masked2 = frames * masks2
    want2 = np.stack([recon(masked2[e], masks2[e]) for e in range(2)])
    got2 = recon.sharded_batch(masked2, masks2, mesh)
    np.testing.assert_allclose(got2, want2, atol=1e-3)


@pytest.mark.slow
def test_model_sharded_generator_matches_replicated(rng):
    """TP completeness hook (SURVEY §2.3): generator forward on a 2x4
    (data, model) mesh with output-channel-sharded kernels == the
    replicated forward; GSPMD inserts the collectives."""
    from p2igan_tpu.models import P2IGenerator
    from p2igan_tpu.parallel.mesh import model_sharded_params

    t, hw = 4, 16
    gen = P2IGenerator(H=hw, W=hw, length=t, num_res=1, base_channels=16,
                       idw_max_points=128, idw_chunk=256)
    b = 4
    frames = jnp.asarray(rng.random((b, t, hw, hw, 1)).astype(np.float32))
    masks = jnp.asarray((rng.random((b, t, hw, hw, 1)) < 0.2).astype(np.float32))
    masked = frames * masks
    variables = gen.init(jax.random.key(0), masked, masks)
    fwd = jax.jit(lambda p, a, m: gen.apply({"params": p}, a, m))
    # reference = the jitted replicated forward (eager vs jit legitimately
    # differ at IDW argmin tie pixels under different fusion)
    want = np.asarray(fwd(variables["params"], masked, masks))

    mesh = create_mesh(("data", "model"), shape=(2, 4))
    params_tp = model_sharded_params(variables["params"], mesh)
    data_sh = batch_sharding(mesh, "data")
    masked_s = jax.device_put(masked, data_sh)
    masks_s = jax.device_put(masks, data_sh)
    got = np.asarray(fwd(params_tp, masked_s, masks_s))
    np.testing.assert_allclose(got, want, atol=1e-5)
