"""Torch checkpoint importer tests: structure completeness + value parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from p2igan_tpu.models import (DKGenerator, P2IDiscriminator, P2IGenerator,
                               SimpleGenerator)
from p2igan_tpu.models import torch_import as TI


def _tree_paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _tree_paths(v, prefix + (k,))
        else:
            out.add(prefix + (k, v.shape))
    return out


def _synthetic_p2igan_state(t=4, base=16, h=16, w=16, num_res=1, depth=2):
    """Torch-layout state_dict with the reference's key names/shapes."""
    rng = np.random.default_rng(0)
    sd = {}

    def add(name, shape):
        sd[name] = torch.from_numpy(rng.normal(0, 0.05, shape).astype(np.float32))

    for i in range(depth):
        add(f"input.layers.{i}.conv.weight", (t, t, 1))
        add(f"input.layers.{i}.conv.bias", (t,))
    add("Convsin.0.main.0.W", (base, t // 4, 9))
    add("Convsin.0.main.0.D", (t, 9, 9))
    add("ConvsOut.0.main.0.W", (t, base // 4, 1))
    for k, ch in enumerate([base, base * 2, base * 4, base * 8]):
        for i in range(num_res):
            for j in (0, 1):
                add(f"Decoder.{k}.layers.{i}.main.{j}.main.0.W", (ch, ch, 9))
                add(f"Decoder.{k}.layers.{i}.main.{j}.main.0.D", (ch, 9, 9))
    for k, (cin, cout, hh, ww) in enumerate(
            [(base * 2, base, h, w), (base * 4, base * 2, h // 2, w // 2),
             (base * 8, base * 4, h // 4, w // 4)]):
        add(f"UP.{k}.pos", (1, 1, hh, ww))
        add(f"UP.{k}.proj.weight", (cout, cin, 1, 1))
        add(f"UP.{k}.proj.bias", (cout,))
    return {k: v.numpy() for k, v in sd.items()}


@pytest.mark.slow
def test_p2igan_import_structure_and_forward(rng):
    t, base, hw = 4, 16, 16
    state = _synthetic_p2igan_state(t=t, base=base, h=hw, w=hw, num_res=1)
    variables = TI.import_p2igan_generator(state, num_res=1)

    gen = P2IGenerator(H=hw, W=hw, length=t, num_res=1, base_channels=base,
                       idw_max_points=64, idw_chunk=256)
    masked = jnp.asarray(rng.random((1, t, hw, hw, 1)).astype(np.float32))
    masks = jnp.asarray((rng.random((1, t, hw, hw, 1)) < 0.2).astype(np.float32))
    ref_vars = gen.init(jax.random.key(0), masked, masks)
    assert _tree_paths(jax.tree_util.tree_map(np.asarray, dict(ref_vars))["params"]) \
        == _tree_paths(variables["params"])
    out = gen.apply({"params": variables["params"]}, masked, masks)
    assert out.shape == masked.shape
    assert np.isfinite(np.asarray(out)).all()


def test_discriminator_import_runs(rng):
    t = 4
    sd = {}
    r = np.random.default_rng(1)
    specs2d = [(t, 64), (64, 128), (128, 256), (256, 256), (256, 1)]
    specs3d = [(1, 32), (32, 64), (64, 128), (128, 128)]
    for idx, (ci, co) in zip((0, 2, 4, 6, 8), specs2d):
        sd[f"d2d.{idx}.weight_orig"] = r.normal(0, 0.05, (co, ci, 3, 3)).astype(np.float32)
        sd[f"d2d.{idx}.bias"] = np.zeros(co, np.float32)
        sd[f"d2d.{idx}.weight_u"] = r.normal(size=co).astype(np.float32)
        sd[f"d2d.{idx}.weight_v"] = r.normal(size=ci * 9).astype(np.float32)
    for idx, (ci, co) in zip((0, 2, 4, 6), specs3d):
        sd[f"d3d.{idx}.weight_orig"] = r.normal(0, 0.05, (co, ci, 3, 3, 3)).astype(np.float32)
        sd[f"d3d.{idx}.bias"] = np.zeros(co, np.float32)
        sd[f"d3d.{idx}.weight_u"] = r.normal(size=co).astype(np.float32)
        sd[f"d3d.{idx}.weight_v"] = r.normal(size=ci * 27).astype(np.float32)
    sd["d3d.8.weight_orig"] = r.normal(0, 0.05, (1, 128, 1, 1, 1)).astype(np.float32)
    sd["d3d.8.bias"] = np.zeros(1, np.float32)
    sd["d3d.8.weight_u"] = r.normal(size=1).astype(np.float32)
    sd["d3d.8.weight_v"] = r.normal(size=128).astype(np.float32)
    sd["alpha2d"] = np.float32(0.3)
    sd["alpha3d"] = np.float32(0.0)

    variables = TI.import_p2igan_discriminator(sd)
    disc = P2IDiscriminator(in_channels=t)
    x = jnp.asarray(rng.random((2, t, 16, 16, 1)).astype(np.float32))
    logits = disc.apply(variables, x, update_stats=False)
    assert np.isfinite(np.asarray(logits)).all()


def test_dk_import_value_parity(rng):
    """Imported torch Linear stack == torch forward on identical features."""
    t, hw, k = 4, 12, 7
    K_s = 4 + 6
    feat = K_s + k
    mlp_t = torch.nn.Sequential(
        torch.nn.Linear(feat, 100), torch.nn.ReLU(),
        torch.nn.Linear(100, 100), torch.nn.ReLU(),
        torch.nn.Linear(100, 100), torch.nn.ReLU(),
        torch.nn.Linear(100, 1),
    )
    sd = {f"_mlp.net.{i}.{p}": par.detach().numpy()
          for i in (0, 2, 4, 6)
          for p, par in (("weight", mlp_t[i].weight), ("bias", mlp_t[i].bias))}
    variables = TI.import_dk_generator(sd)

    gen = DKGenerator(length=t, visible_k=k, num_basis_space=(4, 6))
    masked = rng.random((1, t, hw, hw, 1)).astype(np.float32)
    mask_flat = np.zeros((hw * hw,), np.float32)
    mask_flat[rng.choice(hw * hw, k, replace=False)] = 1.0
    masks = np.broadcast_to(mask_flat.reshape(1, 1, hw, hw, 1),
                            (1, t, hw, hw, 1)).copy()
    masked = masked * masks
    out = np.asarray(gen.apply(variables, jnp.asarray(masked), jnp.asarray(masks)))

    # torch forward with identical feature assembly (ascending-index visible set)
    from p2igan_tpu.ops.wendland import build_phi_space

    phi_s = torch.from_numpy(build_phi_space(hw, hw, (4, 6)))
    vis_idx = np.nonzero(mask_flat)[0]
    ref = np.zeros((1, t, hw * hw), np.float32)
    with torch.no_grad():
        for ti in range(t):
            z = torch.from_numpy(masked[0, ti, :, :, 0].reshape(-1)[vis_idx])
            feats = torch.cat([phi_s, z.expand(hw * hw, k)], dim=1)
            ref[0, ti] = mlp_t(feats).numpy()[:, 0]
    np.testing.assert_allclose(ref.reshape(out.shape), out, atol=2e-4)


@pytest.mark.slow
def test_simple_import_roundtrip(rng):
    gen = SimpleGenerator(base_channels=4)
    masked = jnp.asarray(rng.random((1, 4, 16, 16, 1)).astype(np.float32))
    vars_ = gen.init(jax.random.key(0), masked, masked)
    # export flax -> torch names -> import back; must match exactly
    p = jax.tree_util.tree_map(np.asarray, dict(vars_))

    sd = {}
    for i in range(3):
        enc = p["params"][f"enc{i}"]
        sd[f"encoder.{i}.0.weight"] = np.transpose(enc["kernel"], (4, 3, 0, 1, 2))
        sd[f"encoder.{i}.0.bias"] = enc["bias"]
        sd[f"encoder.{i}.1.weight"] = enc["bn"]["scale"]
        sd[f"encoder.{i}.1.bias"] = enc["bn"]["bias"]
        sd[f"encoder.{i}.1.running_mean"] = p["batch_stats"][f"enc{i}"]["bn"]["mean"]
        sd[f"encoder.{i}.1.running_var"] = p["batch_stats"][f"enc{i}"]["bn"]["var"]
    for tidx, fname in ((0, "dec0"), (2, "dec1"), (4, "dec2")):
        sd[f"decoder.{tidx}.weight"] = np.transpose(
            p["params"][f"{fname}_kernel"], (4, 3, 0, 1, 2))
        sd[f"decoder.{tidx}.bias"] = p["params"][f"{fname}_bias"]

    imported = TI.import_simple_generator(sd)
    out_a = gen.apply(vars_, masked, masked)
    out_b = gen.apply({"params": imported["params"],
                       "batch_stats": imported["batch_stats"]}, masked, masked)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)
