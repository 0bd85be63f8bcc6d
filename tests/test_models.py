import jax
import jax.numpy as jnp
import numpy as np
import pytest


from p2igan_tpu.models import (
    DKGenerator,
    P2IDiscriminator,
    P2IGenerator,
    STDKGenerator,
    SimpleDiscriminator,
    SimpleGenerator,
    build_discriminator,
    build_generator,
)
from p2igan_tpu.ops.wendland import build_phi_space, build_phi_time


def _batch(rng, b=2, t=4, h=16, w=16, c=1, p_obs=0.1):
    video = rng.random((b, t, h, w, c)).astype(np.float32)
    mask = (rng.random((b, t, h, w, c)) < p_obs).astype(np.float32)
    return jnp.asarray(video * mask), jnp.asarray(mask)


def test_simple_generator_discriminator(rng):
    masked, mask = _batch(rng)
    gen = SimpleGenerator(base_channels=8)
    vars_ = gen.init(jax.random.key(0), masked, mask)
    out = gen.apply(vars_, masked, mask)
    assert out.shape == masked.shape
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    # train mode updates batch stats
    out2, upd = gen.apply(vars_, masked, mask, train=True, mutable=["batch_stats"])
    assert "batch_stats" in upd

    disc = SimpleDiscriminator(base_channels=8)
    dvars = disc.init(jax.random.key(1), masked)
    logits = disc.apply(dvars, masked)
    assert logits.shape == (2, 1)


def test_discriminator_branch3d_dtype(rng):
    """bf16 3D branch: config-wired, close to f32, and f32 stays default."""
    video = jnp.asarray(rng.random((2, 4, 16, 16, 1)).astype(np.float32))
    disc = P2IDiscriminator(in_channels=4)
    dvars = disc.init(jax.random.key(0), video)
    ref = disc.apply(dvars, video)
    out = disc.clone(branch3d_dtype=jnp.bfloat16).apply(dvars, video)
    assert out.dtype == jnp.float32  # fused head stays f32
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(out - ref))) / scale < 0.02

    cfg = {"model": {"name": "p2igan", "in_channels": 1,
                     "disc_branch3d_dtype": "bfloat16"},
           "data": {"train": {"sample_length": 4}}}
    assert build_discriminator(cfg).branch3d_dtype == jnp.bfloat16
    del cfg["model"]["disc_branch3d_dtype"]
    assert build_discriminator(cfg).branch3d_dtype == jnp.float32


def test_simple_generator_serving_parity(rng):
    """fold_for_inference's MXU reformulations (enc0 im2col matmul, dec2
    S-matrix stencil, BN fold) must match the plain conv path.

    BN stats/affine are randomized away from their identity init so the BN
    fold is actually exercised; the fold reassociates one multiply per tap,
    hence the 1e-5 (not exact) tolerance."""
    masked, mask = _batch(rng, b=2, t=4, h=16, w=16)
    gen = SimpleGenerator(base_channels=8)
    import flax.core
    vars_ = flax.core.unfreeze(gen.init(jax.random.key(0), masked, mask))
    keys = iter(jax.random.split(jax.random.key(7), 24))
    for blk in ("enc0", "enc1", "enc2"):
        bn = vars_["params"][blk]["bn"]
        bn["scale"] = 1.0 + 0.3 * jax.random.normal(next(keys), bn["scale"].shape)
        bn["bias"] = 0.2 * jax.random.normal(next(keys), bn["bias"].shape)
        st = vars_["batch_stats"][blk]["bn"]
        st["mean"] = 0.1 * jax.random.normal(next(keys), st["mean"].shape)
        st["var"] = jnp.exp(0.5 * jax.random.normal(next(keys), st["var"].shape))
    ref = gen.apply(vars_, masked, mask)
    sgen, svars = gen.fold_for_inference(vars_)
    assert sgen.serving
    assert "batch_stats" not in svars and "bn" not in svars["params"]["enc0"]
    out = sgen.apply(svars, masked, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # serving DEFAULT must stay the S-matrix dec2: the fused Pallas stencil
    # kernel measured 6 ev/s slower end-to-end (PROFILE.md round-5 "simple
    # dec2 regression") and is opt-in via dec2_pallas
    assert not sgen.dec2_pallas
    out_pl = sgen.clone(dec2_pallas=True).apply(svars, masked, mask)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_p2igan_generator_shapes(rng):
    masked, mask = _batch(rng, t=4, h=16, w=16)
    gen = P2IGenerator(H=16, W=16, length=4, num_res=1, base_channels=16,
                       idw_max_points=128, idw_chunk=256)
    vars_ = gen.init(jax.random.key(0), masked, mask)
    out = gen.apply(vars_, masked, mask)
    assert out.shape == masked.shape
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh range

    # gradient flows
    def loss(p):
        return jnp.mean(jnp.abs(gen.apply(p, masked, mask)))

    g = jax.grad(lambda p: loss(p))(vars_)
    flat = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in flat)


@pytest.mark.slow
def test_p2igan_discriminator(rng):
    masked, mask = _batch(rng, t=4, h=16, w=16)
    disc = P2IDiscriminator(in_channels=4)
    dvars = disc.init(jax.random.key(0), masked)
    logits, upd = disc.apply(dvars, masked, update_stats=True, mutable=["spectral"])
    assert logits.ndim == 2 and logits.shape[0] == 2
    # power iteration state changed
    u_before = dvars["spectral"]["d2d_0"]["u"]
    u_after = upd["spectral"]["d2d_0"]["u"]
    assert not np.allclose(np.asarray(u_before), np.asarray(u_after))


def _naive_mlp(feats, p):
    h = np.maximum(feats @ p["fc1"] + p["b1"][0], 0)
    h = np.maximum(h @ p["fc2"] + p["b2"][0], 0)
    h = np.maximum(h @ p["fc3"] + p["b3"][0], 0)
    return h @ p["fc4"] + p["b4"][0]


def test_dk_matches_naive_concat(rng):
    """Split-first-layer scan formulation == naive [phi_s | z] concat MLP."""
    b, t, h, w = 2, 4, 12, 12
    masked, mask = _batch(rng, b=b, t=t, h=h, w=w, p_obs=0.3)
    gen = DKGenerator(length=t, visible_k=7, num_basis_space=(4, 6))
    vars_ = gen.init(jax.random.key(0), masked, mask)
    out = np.asarray(gen.apply(vars_, masked, mask))

    p = {k: np.asarray(v) for k, v in vars_["params"]["mlp"].items()}
    phi_s = build_phi_space(h, w, (4, 6))
    x_flat = np.asarray(masked)[..., 0].reshape(b, t, -1)
    m_flat = np.asarray(mask)[..., 0].reshape(b, t, -1)
    ref = np.zeros((b, t, h * w), np.float32)
    for bi in range(b):
        for ti in range(t):
            # top-k of the mask = observed pixels (ascending index tie-break)
            idx = np.argsort(-m_flat[bi, ti], kind="stable")[:7]
            z = x_flat[bi, ti][np.sort(idx)] if False else x_flat[bi, ti][idx]
            feats = np.concatenate(
                [phi_s, np.broadcast_to(z, (h * w, 7))], axis=1)
            ref[bi, ti] = _naive_mlp(feats, p)[:, 0]
    np.testing.assert_allclose(ref.reshape(out.shape), out, atol=2e-4)


def test_stdk_matches_naive_concat(rng):
    b, t, h, w = 1, 4, 10, 10
    masked, mask = _batch(rng, b=b, t=t, h=h, w=w, p_obs=0.3)
    gen = STDKGenerator(length=t, visible_k=5, num_basis_space=(4, 6),
                        num_basis_time=(2, 3))
    vars_ = gen.init(jax.random.key(0), masked, mask)
    out = np.asarray(gen.apply(vars_, masked, mask))

    p = {k: np.asarray(v) for k, v in vars_["params"]["mlp"].items()}
    phi_s = build_phi_space(h, w, (4, 6))
    phi_t = build_phi_time(t, (2, 3))
    x_flat = np.asarray(masked)[..., 0].reshape(b, t, -1)
    m_flat = np.asarray(mask)[..., 0].reshape(b, t, -1)
    ref = np.zeros((b, t, h * w), np.float32)
    for bi in range(b):
        zs = []
        for ti in range(t):
            idx = np.argsort(-m_flat[bi, ti], kind="stable")[:5]
            zs.append(x_flat[bi, ti][idx])
        z_seq = np.concatenate(zs)
        for ti in range(t):
            feats = np.concatenate(
                [phi_s,
                 np.broadcast_to(phi_t[ti], (h * w, phi_t.shape[1])),
                 np.broadcast_to(z_seq, (h * w, z_seq.shape[0]))], axis=1)
            ref[bi, ti] = _naive_mlp(feats, p)[:, 0]
    np.testing.assert_allclose(ref.reshape(out.shape), out, atol=2e-4)


def test_registry():
    cfg = {
        "model": {"name": "p2igan", "in_channels": 1, "base_channels": 64},
        "data": {"train": {"data_root": "/x", "w": 128, "h": 128, "sample_length": 16,
                           "mask": {"type": "stis", "block_sizes": [10]}}},
    }
    gen = build_generator(cfg)
    assert isinstance(gen, P2IGenerator)
    assert gen.length == 16 and gen.H == 128
    disc = build_discriminator(cfg)
    assert isinstance(disc, P2IDiscriminator)
    assert disc.in_channels == 16

    cfg["model"]["name"] = "dk"
    assert isinstance(build_generator(cfg), DKGenerator)
    cfg["model"]["name"] = "stdk"
    assert isinstance(build_generator(cfg), STDKGenerator)
    cfg["model"]["name"] = "simple"
    assert isinstance(build_generator(cfg), SimpleGenerator)


def test_fold_for_inference_equivalence(rng):
    """Folded eval variant (plain HWIO kernels composed once on host) must
    reproduce the factored forward."""
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.models import P2IGenerator

    t, hw = 4, 16
    gen = P2IGenerator(H=hw, W=hw, length=t, num_res=1, base_channels=16,
                       idw_max_points=64, idw_chunk=256)
    masks = (rng.random((2, t, hw, hw, 1)) < 0.2).astype(np.float32)
    frames = rng.random((2, t, hw, hw, 1)).astype(np.float32)
    masked = frames * masks
    variables = gen.init(jax.random.key(0), jnp.asarray(masked), jnp.asarray(masks))

    want = np.asarray(gen.apply(variables, jnp.asarray(masked), jnp.asarray(masks)))
    gen_eval, folded = gen.fold_for_inference(variables)
    assert gen_eval.inference
    got = np.asarray(gen_eval.apply(folded, jnp.asarray(masked), jnp.asarray(masks)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_from_config_idw_budget_covers_every_mask_type(rng):
    """The static IDW point budget must bound the worst-case observed-point
    count for EVERY mask family (masks.py draws interval/block randomly per
    item); an undersized budget silently drops points in the static nonzero
    gather. Regression for the stin/fi/nowcasting undercount."""
    from p2igan_tpu.data.masks import create_mask_np
    from p2igan_tpu.models import P2IGenerator

    H = W = 64
    T = 8
    for mask_type in ("sti", "stin", "fi", "nowcasting"):
        cfg = {"model": {"name": "p2igan", "base_channels": 4 * T},
               "data": {"train": {"data_root": "x", "h": H, "w": W,
                                  "sample_length": T,
                                  "mask": {"type": mask_type, "keep": 4,
                                           "block_sizes": [4],
                                           "interval": [2, 5]}}}}
        gen = P2IGenerator.from_config(cfg)
        worst = 0
        for seed in range(24):
            m = create_mask_np((T, H, W, 1), np.random.default_rng(seed),
                               mask_type, block_sizes=[4], keep=4,
                               interval=[2, 5])
            worst = max(worst, int(m.sum()))
        assert gen.idw_max_points >= worst, (
            f"{mask_type}: budget {gen.idw_max_points} < observed {worst}")


def test_from_config_stis_budget_counts_gauge_file(tmp_path):
    """stis budgets derive from the actual gauge count in the mask file —
    a 300-gauge file must not be truncated to the old 256 static cap."""
    from p2igan_tpu.models import P2IGenerator

    H = W = 64
    T = 8
    rng = np.random.default_rng(0)
    mat = np.zeros((H, W), np.int64)
    flat = rng.choice(H * W, 300, replace=False)
    mat[np.unravel_index(flat, (H, W))] = 1
    f = tmp_path / "gauges.txt"
    np.savetxt(f, mat, fmt="%d")
    cfg = {"model": {"name": "p2igan", "base_channels": 4 * T},
           "data": {"train": {"data_root": "x", "h": H, "w": W,
                              "sample_length": T,
                              "mask": {"type": "stis", "file": str(f)}}}}
    gen = P2IGenerator.from_config(cfg)
    assert gen.idw_max_points >= T * 300
    # unreadable file falls back to the documented 256-gauge cap
    cfg["data"]["train"]["mask"]["file"] = str(tmp_path / "missing.txt")
    gen2 = P2IGenerator.from_config(cfg)
    assert gen2.idw_max_points >= T * 256


def test_snconv_3d_default_stride_padding():
    """A 3D SNConv with the (2D) default stride/padding must broadcast them
    to rank 3 instead of crashing inside lax.conv_general_dilated."""
    import jax
    import jax.numpy as jnp

    from p2igan_tpu.ops.spectral_norm import SNConv

    conv = SNConv(2, 4, kernel_size=(3, 3, 3))
    x = jnp.ones((1, 4, 8, 8, 2))
    vars_ = conv.init(jax.random.key(0), x)
    out = conv.apply(vars_, x)
    assert out.shape == (1, 4, 8, 8, 4)


def test_from_config_budget_covers_split_overrides_and_crop(tmp_path):
    """Two budget edge cases: (a) the sti block grid is generated at the
    STORED frame size and center-cropped, so a grid-misaligned crop can
    intersect one extra block per dimension; (b) valid/test splits may
    override the train mask with a DENSER family — the budget must take the
    max over every split, not just train."""
    from p2igan_tpu.models import P2IGenerator

    H = W = 128
    T = 16
    # (a) crop-misalignment headroom: worst case per frame for bs=4 is
    # (128/4 + 1)^2 = 1089 blocks, above the aligned 1024
    cfg = {"model": {"name": "p2igan", "base_channels": 4 * T},
           "data": {"train": {"data_root": "x", "h": H, "w": W,
                              "sample_length": T,
                              "mask": {"type": "sti", "block_sizes": [4]}}}}
    gen = P2IGenerator.from_config(cfg)
    assert gen.idw_max_points >= T * 33 * 33

    # (b) sparse train mask (stis file) + dense valid override (sti)
    rng = np.random.default_rng(0)
    mat = np.zeros((H, W), np.int64)
    mat[np.unravel_index(rng.choice(H * W, 79, replace=False), (H, W))] = 1
    f = tmp_path / "gauges.txt"
    np.savetxt(f, mat, fmt="%d")
    cfg = {"model": {"name": "p2igan", "base_channels": 4 * T},
           "data": {"train": {"data_root": "x", "h": H, "w": W,
                              "sample_length": T,
                              "mask": {"type": "stis", "file": str(f)}},
                    "valid": {"data_root": "x",
                              "mask": {"type": "sti", "block_sizes": [4]}}}}
    gen = P2IGenerator.from_config(cfg)
    assert gen.idw_max_points >= T * 33 * 33  # not the 16*79 stis budget


def test_dk_init_matches_reference_init_weights():
    """Reference DK/STDK call BaseNetwork.init_weights at construction:
    Linear weights kaiming_normal_(a=0, fan_in) (std sqrt(2/fan_in)), biases
    zero. Regression for the U(-1,1) bias / torch-default-weight init."""
    import jax

    from p2igan_tpu.models import DKGenerator

    gen = DKGenerator(length=4)
    v = gen.init(jax.random.key(0),
                 jnp.zeros((1, 4, 16, 16, 1)), jnp.ones((1, 4, 16, 16, 1)))
    mlp = v["params"]["mlp"]
    for b in ("b1", "b2", "b3", "b4"):
        assert float(jnp.abs(mlp[b]).max()) == 0.0
    fc2 = np.asarray(mlp["fc2"])  # fan_in = 100 -> std sqrt(2/100) ~ 0.1414
    assert abs(fc2.std() - np.sqrt(2.0 / 100)) < 0.02


def test_snconv_spectral_state_uses_init_rng():
    """SNConv u/v derive from the Flax init RNG: same-width layers get
    DIFFERENT vectors and different seeds give different states (previously
    hard-coded key(0)/key(1) shared one u across every layer and seed)."""
    import jax

    from p2igan_tpu.models import P2IDiscriminator

    disc = P2IDiscriminator(in_channels=4)
    x = jnp.zeros((1, 4, 16, 16, 1))
    s0 = dict(disc.init(jax.random.key(0), x))["spectral"]
    s1 = dict(disc.init(jax.random.key(1), x))["spectral"]
    # same width (256), different layers -> different u
    assert not np.allclose(np.asarray(s0["d2d_4"]["u"]),
                           np.asarray(s0["d2d_6"]["u"]))
    # different seeds -> different u
    assert not np.allclose(np.asarray(s0["d2d_4"]["u"]),
                           np.asarray(s1["d2d_4"]["u"]))


def test_dk_rejects_multichannel_input():
    import jax

    from p2igan_tpu.models import DKGenerator

    gen = DKGenerator(length=2)
    x = jnp.zeros((1, 2, 8, 8, 3))
    with pytest.raises(ValueError, match="single-channel"):
        gen.init(jax.random.key(0), x, x)


def test_select_visible_shared_batch_mask_matches_per_frame(rng):
    """With a (b, t)-constant mask, the single-top_k fast path selects the
    same values as the reference per-(b, t) top_k (same lowest-index ties)."""
    from p2igan_tpu.models.dk import select_visible

    b, t, HW, k = 3, 4, 64, 9
    m_row = np.zeros((HW,), np.float32)
    m_row[np.random.default_rng(0).choice(HW, k, replace=False)] = 1.0
    m = jnp.asarray(np.broadcast_to(m_row, (b, t, HW)).copy())
    x = jnp.asarray(rng.random((b, t, HW)).astype(np.float32))
    ref = np.asarray(select_visible(x, m, k))
    out = np.asarray(select_visible(x, m, k, shared_batch_mask=True))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("family", ["dk", "stdk"])
def test_dk_shared_batch_mask_model_equality(rng, family):
    from p2igan_tpu.models import DKGenerator, STDKGenerator

    b, t, H, W = 2, 4, 12, 10
    cls = DKGenerator if family == "dk" else STDKGenerator
    kw = dict(length=t, visible_k=5, num_basis_space=(4, 6))
    if family == "stdk":
        kw["num_basis_time"] = (2, 3)
    gen = cls(**kw)
    gen_shared = cls(shared_batch_mask=True, **kw)
    m_row = (rng.random((1, 1, H, W, 1)) < 0.3).astype(np.float32)
    m_row[..., :1, :, :] = 1.0
    masks = jnp.asarray(np.broadcast_to(m_row, (b, t, H, W, 1)).copy())
    masked = jnp.asarray(rng.random((b, t, H, W, 1)).astype(np.float32)) * masks
    variables = gen.init(jax.random.key(0), masked, masks)
    ref = np.asarray(gen.apply(variables, masked, masks))
    out = np.asarray(gen_shared.apply(variables, masked, masks))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_dk_shared_batch_mask_from_config():
    """stis mask configs turn on the shared-mask fast path; others don't;
    the inference builder follows the TEST split's mask."""
    from p2igan_tpu.models import build_generator_for_inference

    base = {"model": {"name": "dk", "in_channels": 1},
            "data": {"train": {"sample_length": 4,
                               "mask": {"type": "stis", "file": "m.txt"}}}}
    gen = build_generator(base)
    assert isinstance(gen, DKGenerator) and gen.shared_batch_mask

    base["data"]["train"]["mask"] = {"type": "sti", "block_sizes": [8]}
    assert not build_generator(base).shared_batch_mask

    # infer builder: test split overrides train's sti with stis
    base["data"]["test"] = {"mask": {"type": "stis", "file": "m.txt"}}
    gi = build_generator_for_inference(base)
    assert gi.shared_batch_mask
    # explicit null mask on test deletes the inherited one -> not shared
    base["data"]["test"] = {"mask": None}
    assert not build_generator_for_inference(base).shared_batch_mask

    base["model"]["name"] = "stdk"
    base["data"]["test"] = {"mask": {"type": "stis", "file": "m.txt"}}
    gs = build_generator_for_inference(base)
    assert isinstance(gs, STDKGenerator) and gs.shared_batch_mask


def test_dk_shared_batch_mask_value_parity(rng):
    """With a genuinely shared mask, the fast path == the generic path."""
    mask1 = (rng.random((1, 1, 16, 16, 1)) < 0.3).astype(np.float32)
    masks = jnp.asarray(np.broadcast_to(mask1, (2, 4, 16, 16, 1)).copy())
    frames = jnp.asarray(rng.random((2, 4, 16, 16, 1)).astype(np.float32))
    masked = frames * masks
    k = int(mask1.sum())
    for klass in (DKGenerator, STDKGenerator):
        gen = klass(length=4, visible_k=k)
        vars_ = gen.init(jax.random.key(0), masked, masks)
        want = gen.apply(vars_, masked, masks)
        got = klass(length=4, visible_k=k,
                    shared_batch_mask=True).apply(vars_, masked, masks)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
