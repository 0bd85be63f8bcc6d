"""P2I-GAN generator and dual-branch temporal discriminator (flax, NHWC).

Re-designs of reference ``p2igan_bench/models/p2igan.py``. Canonical tensor
API is channel-last: ``(B, T, H, W, C)`` in and out (the reference permutes to
(B, T, C, H, W); here the dataset layout is kept end-to-end). The channel
axis after T-flattening preserves torch's ``c*t`` ordering so checkpoints
import 1:1.

Generator forward (reference p2igan.py:72-112):
  flatten T into channels -> InputBlock IDW densification -> grouped 3x3 conv
  + repeat-interleave(4) skip -> 3x DownsampleDuplicateChannels pyramid
  (64/128/256/512 ch) -> coarse-to-fine EBlock+UPPos decoding (only the x_4
  skip is additive; x_2 / x_ skips are overwritten, as in the reference) ->
  1x1 grouped conv to t channels -> tanh.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.layers import (
    BasicConvDO,
    InputBlock,
    ResBlockDO,
    UPPos,
    downsample_duplicate_channels,
)
from ..ops.spectral_norm import SNConv


def fold_p2igan_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Fold every factored DOConv {W (out,in/g,D_mul), D (in,MN,D_mul)} node
    of a variables pytree into the eval variant's plain HWIO ``W`` kernel
    (host numpy; identical composition to the in-graph einsum)."""
    import numpy as np

    from ..ops.doconv import fold_doconv

    def walk(node):
        if not isinstance(node, dict):
            return node
        w = node.get("W")
        if w is not None and "D" in node and getattr(w, "ndim", 0) == 3:
            oihw = fold_doconv(np.asarray(w), np.asarray(node["D"]))
            out: Dict[str, Any] = {"W": np.transpose(oihw, (2, 3, 1, 0))}
            if "bias" in node:
                out["bias"] = node["bias"]
            return out
        return {k: walk(v) for k, v in node.items()}

    return walk(dict(variables))


def _data_cfg(config: Dict[str, Any]) -> Dict[str, Any]:
    return config.get("data_loader") or config["data"]["train"]


def _mask_points_budget(mask_cfg: Dict[str, Any], H: int, W: int,
                        length: int) -> int:
    """Worst-case observed-point count per sample for one mask config
    (data/masks.py:59-104); every branch bounds its maximum draw.

    The sti block grid is generated at the STORED frame size and only then
    center-cropped (stores.py EventDataset), so a crop misaligned with the
    block grid can intersect one extra block per dimension — the per-frame
    bound is (ceil(H/bs)+1)*(ceil(W/bs)+1), not ceil*ceil."""
    mask_type = mask_cfg.get("type", "sti")
    bs = min(mask_cfg.get("block_sizes", [4]) or [4])
    keep = min(int(mask_cfg.get("keep", 4)), length)
    per_frame_sti = (-(-H // bs) + 1) * (-(-W // bs) + 1)
    if mask_type == "sti":
        return length * per_frame_sti
    if mask_type == "stin":
        # first `keep` frames fully observed + the sti pattern on the rest
        return keep * H * W + (length - keep) * per_frame_sti
    if mask_type == "fi":
        # every (interval+1)-th frame fully observed; min interval = most
        iv = min(mask_cfg.get("interval", [2, 5]) or [2])
        return (-(-length // (iv + 1))) * H * W
    if mask_type == "nowcasting":
        return keep * H * W
    if mask_type == "stis":
        # the gauge mask is a fixed file: count its gauges exactly so the
        # static nonzero budget can never truncate (the 256 fallback only
        # applies when the file is unreadable at config time)
        n_gauges = 256
        mask_file = mask_cfg.get("file")
        if mask_file:
            try:
                from ..data.masks import load_gauge_mask

                n_gauges = int((load_gauge_mask(mask_file) > 0).sum())
            except OSError:
                import logging

                logging.warning(
                    "stis gauge file %s unreadable at config time; "
                    "falling back to a %d-gauge IDW budget", mask_file,
                    n_gauges)
        return length * max(1, n_gauges)
    return length * H * W  # unknown type: full budget, never truncate


class EBlock(nn.Module):
    """num_res x ResBlock_do (reference p2igan.py:176-183)."""

    channels: int
    num_res: int = 4
    factored: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_res):
            x = ResBlockDO(self.channels, factored=self.factored, name=f"res{i}")(x)
        return x


class P2IGenerator(nn.Module):
    """Main generator. masked/masks: (B, T, H, W, C) -> preds (B, T, H, W, C)."""

    H: int = 128
    W: int = 128
    length: int = 16
    num_res: int = 4
    base_channels: int = 64
    inference: bool = False  # eval variant = folded DO-convs
    idw_max_points: int = 2048
    idw_chunk: int = 16384
    idw_factored: bool = False  # exact fast path for frame-constant masks
    idw_shared_batch_mask: bool = False  # one spatial mask for the whole batch
    idw_k: int = 4  # k-NN order (reference layer.py:259 uses 4)
    compute_dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, config: Dict[str, Any], inference: bool = False,
                    **kw) -> "P2IGenerator":
        data_cfg = _data_cfg(config)
        length = data_cfg.get("sample_length", 16) or 16
        model_cfg = config.get("model", {})
        mask_cfg = data_cfg.get("mask", {})
        mask_type = mask_cfg.get("type", "sti")
        H, W = data_cfg["h"], data_cfg["w"]
        # Size the static IDW point budget from EVERY split's mask config
        # (valid/test may override the train mask with a denser family —
        # build_dataset_args semantics); undersizing silently drops points
        # in the static nonzero gather.
        n_pts = _mask_points_budget(mask_cfg, H, W, length)
        for split, split_cfg in (config.get("data") or {}).items():
            if split == "train" or not isinstance(split_cfg, dict):
                continue
            m = dict(mask_cfg)
            if "mask" in split_cfg:
                m = {} if split_cfg["mask"] is None else {**m,
                                                          **split_cfg["mask"]}
            n_pts = max(n_pts, _mask_points_budget(
                m, split_cfg.get("h", H) or H, split_cfg.get("w", W) or W,
                split_cfg.get("sample_length", length) or length))
        max_points = kw.pop("idw_max_points", -(-n_pts // 128) * 128)
        # sti/stis masks share one spatial pattern across frames -> the
        # factorized exact k-NN applies (stin/fi/nowcasting do not qualify);
        # stis masks come from one fixed gauge file, so the whole batch also
        # shares the mask and its gauge selection is computed once
        factored = kw.pop("idw_factored", mask_type in ("sti", "stis"))
        shared = kw.pop("idw_shared_batch_mask", mask_type == "stis")
        return cls(H=H, W=W, length=length,
                   base_channels=model_cfg.get("base_channels", 64),
                   inference=inference, idw_max_points=max_points,
                   idw_factored=factored, idw_shared_batch_mask=shared, **kw)

    def fold_for_inference(self, variables: Dict[str, Any]):
        """(eval generator, folded variables): compose every factored DOConv
        (W, D) into its plain HWIO kernel ONCE on host.

        Mirrors the reference's eval blocks (BasicConv_do_eval /
        ResBlock_do_eval, layer.py:43-147) — but the reference's infer path
        never folds (build_generator keeps inference=False), so its GPU
        re-composes every forward. The round-2 trace showed the same cost
        here (per-scan-step weight composition + f32->bf16 kernel copies);
        folding removes it from the hot program entirely.
        """
        folded = fold_p2igan_variables(variables)
        return self.clone(inference=True), folded

    def prepare_idw(self, mask_xy: jax.Array):
        """Precompute the mask-derived gauge selection for the factored
        shared-mask IDW path (stis gauges / sliding windows of one event).

        ``mask_xy``: (H, W) spatial observation pattern. The result can be fed
        to ``__call__(..., idw_prepared=...)`` so the selection runs once per
        run instead of inside every compiled window batch (it is a constant of
        the mask, ~never of the values)."""
        from ..ops.idw import factored_prepare_full

        max_gauges = InputBlock.gauge_budget(self.idw_max_points,
                                             self.length)
        # the static nonzero gather truncates silently under jit; when the
        # mask is concrete (the hoisted host-side path) we can check it
        if not isinstance(mask_xy, jax.core.Tracer):
            n_obs = int(np.asarray(mask_xy > 0).sum())
            if n_obs > max_gauges:
                raise ValueError(
                    f"mask has {n_obs} observed gauges but the IDW budget "
                    f"allows {max_gauges} (idw_max_points="
                    f"{self.idw_max_points}, length={self.length}); raise "
                    f"idw_max_points or fix the mask config")
        return factored_prepare_full(mask_xy, max_gauges, k=self.idw_k)

    @nn.compact
    def __call__(self, masked_frames: jax.Array, masks: jax.Array,
                 idw_prepared=None) -> jax.Array:
        b, t, h, w, c = masked_frames.shape
        factored = not self.inference
        base = self.base_channels

        # (B,T,H,W,C) -> (B,H,W,T*C), channel idx = t*C + c (torch c*t order)
        x_in = jnp.transpose(masked_frames, (0, 2, 3, 1, 4)).reshape(b, h, w, t * c)
        m_in = jnp.transpose(masks, (0, 2, 3, 1, 4)).reshape(b, h, w, t * c)

        x = InputBlock(depth=2, k=self.idw_k, rho=2.0, tau=0.05, chunk=self.idw_chunk,
                       max_points=self.idw_max_points,
                       factored=self.idw_factored,
                       shared_batch_mask=self.idw_shared_batch_mask,
                       frames=self.length,  # budget consistent w/ prepare_idw
                       name="input")(x_in, m_in, prepared=idw_prepared)
        x = x.astype(self.compute_dtype)

        # eval path fuses the grouped conv + repeat-interleave(4) skip into
        # one dense conv (identity taps in the kernel); training keeps the
        # factored composition + explicit skip
        fuse_in = self.inference and base == 4 * t * c
        x_ = BasicConvDO(t * c, base, 3, relu=False, groups=4, factored=factored,
                         fuse_repeat_skip=fuse_in, dense_groups=True,
                         name="Convsin_0")(x)
        if not fuse_in:
            x_ = x_ + jnp.repeat(x, 4, axis=-1)
        x_2 = downsample_duplicate_channels(x_, t)        # (H/2, 2*base)
        x_4 = downsample_duplicate_channels(x_2, t)       # (H/4, 4*base)
        x_8 = downsample_duplicate_channels(x_4, t)       # (H/8, 8*base)

        res1 = EBlock(base * 8, self.num_res, factored, name="Decoder_3")(x_8)
        res1 = UPPos(base * 8, base * 4, self.H // 4, self.W // 4,
                     fold_gate=self.inference, name="UP_2")(res1)

        x_4 = x_4 + res1
        res2 = EBlock(base * 4, self.num_res, factored, name="Decoder_2")(x_4)
        res2 = UPPos(base * 4, base * 2, self.H // 2, self.W // 2,
                     fold_gate=self.inference, name="UP_1")(res2)

        # NOTE: reference overwrites the x_2 and x_ skips (p2igan.py:100,105)
        res3 = EBlock(base * 2, self.num_res, factored, name="Decoder_1")(res2)
        res3 = UPPos(base * 2, base, self.H, self.W,
                     fold_gate=self.inference, name="UP_0")(res3)

        z = EBlock(base, self.num_res, factored, name="Decoder_0")(res3)
        # the grouped 1x1 head expands to block-diagonal dense — XLA's
        # grouped lowering at (B,128,128,64) costs ~1.2 ms/event in 5D
        # relayouts + a (4,4)-tile conv (PROFILE.md); exact same numbers
        z = BasicConvDO(base, t * c, 1, relu=False, groups=4, factored=factored,
                        dense_groups=True, name="ConvsOut_0")(z)

        out = jnp.tanh(z.astype(jnp.float32))  # (B,H,W,T*C)
        return jnp.transpose(out.reshape(b, h, w, t, c), (0, 3, 1, 2, 4))


class P2IDiscriminator(nn.Module):
    """Dual-branch (2D sequence + 3D spatiotemporal) spectral-norm critic.

    Reference p2igan.py:115-173. x: (B, T, H, W, C) -> logits (B, N).
    ``update_stats=True`` advances the spectral-norm power iterations
    (training forwards); pass ``mutable=['spectral']`` then.
    """

    in_channels: int = 16  # = C * T
    # Compute dtype of the 3D branch (the train step's biggest coherent
    # block, ~17 ms/step at batch 12). bf16 halves its HBM traffic; measured
    # on chip before adopting (PROFILE.md "D 3D branch bf16").
    branch3d_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False) -> jax.Array:
        b, t, h, w, c = x.shape
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)  # noqa: E731

        # 2D branch over (B, H, W, T*C)
        y = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, t * c)
        y = lrelu(SNConv(t * c, 64, (3, 3), (1, 1), (1, 1), name="d2d_0")(y, update_stats))
        y = lrelu(SNConv(64, 128, (3, 3), (2, 2), (1, 1), name="d2d_2")(y, update_stats))
        y = lrelu(SNConv(128, 256, (3, 3), (2, 2), (1, 1), name="d2d_4")(y, update_stats))
        y = lrelu(SNConv(256, 256, (3, 3), (1, 1), (1, 1), name="d2d_6")(y, update_stats))
        out2d = SNConv(256, 1, (3, 3), (1, 1), (1, 1), name="d2d_8")(y, update_stats)

        # 3D branch over (B, T, H, W, C)
        z = x.astype(self.branch3d_dtype)
        z = lrelu(SNConv(c, 32, (3, 3, 3), (1, 2, 2), (1, 1, 1), name="d3d_0")(z, update_stats))
        z = lrelu(SNConv(32, 64, (3, 3, 3), (1, 2, 2), (1, 1, 1), name="d3d_2")(z, update_stats))
        z = lrelu(SNConv(64, 128, (3, 3, 3), (1, 2, 2), (1, 1, 1), name="d3d_4")(z, update_stats))
        z = lrelu(SNConv(128, 128, (3, 3, 3), (2, 1, 1), (1, 1, 1), name="d3d_6")(z, update_stats))
        out3d = SNConv(128, 1, (1, 1, 1), (1, 1, 1), (0, 0, 0), name="d3d_8")(z, update_stats)
        out3d_2d = jnp.mean(out3d.astype(jnp.float32), axis=1)  # mean over T'

        if out3d_2d.shape[1:3] != out2d.shape[1:3]:
            from ..ops.convs import bilinear_resize_align_false

            out3d_2d = bilinear_resize_align_false(out3d_2d, out2d.shape[1:3])

        alpha2d = self.param("alpha2d", nn.initializers.zeros, ())
        # alpha3d exists in the reference but is unused (p2igan.py:145)
        self.param("alpha3d", nn.initializers.zeros, ())
        fused = jax.nn.sigmoid(alpha2d) * out2d + out3d_2d
        return fused.reshape(b, -1)
