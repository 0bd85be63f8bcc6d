"""Model registry keyed identically to the reference
(``p2igan_bench/models/__init__.py:13-46``): ``model.name`` in
{p2igan, dk, stdk, simple}; dk/stdk take ``sample_length`` from
``data_loader`` or ``data.train`` (default 16); the P2I discriminator's 2D
branch input width is ``in_channels * sample_length``."""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from .dk import DKGenerator, DKMLP  # noqa: F401
from .p2igan import P2IDiscriminator, P2IGenerator  # noqa: F401
from .simple import SimpleDiscriminator, SimpleGenerator  # noqa: F401
from .stdk import STDKGenerator  # noqa: F401


def build_generator(cfg: Dict[str, Any], inference: bool = False) -> nn.Module:
    model_cfg = cfg.get("model", {})
    model_name = str(model_cfg.get("name", "simple")).lower()
    in_channels = model_cfg.get("in_channels", 1)
    out_channels = model_cfg.get("out_channels", in_channels)
    base_channels = model_cfg.get("base_channels", 64)

    if model_name == "p2igan":
        return P2IGenerator.from_config(cfg, inference=inference)
    if model_name == "dk":
        return DKGenerator.from_config(cfg)
    if model_name == "stdk":
        return STDKGenerator.from_config(cfg)
    return SimpleGenerator(in_channels=in_channels, out_channels=out_channels,
                           base_channels=base_channels)


def build_generator_for_inference(cfg: Dict[str, Any]) -> nn.Module:
    """Inference-time builder (reference scripts/infer.py:83-106): dk/stdk take
    test sample_length, falling back to train, then 16."""
    model_cfg = cfg.get("model", {})
    model_name = str(model_cfg.get("name", "simple")).lower()
    if model_name in ("dk", "stdk"):
        data_cfg = cfg.get("data", {})
        sample_length = (
            data_cfg.get("test", {}).get("sample_length")
            or data_cfg.get("train", {}).get("sample_length")
            or 16
        )
        # shared_batch_mask follows the mask the SERVING data uses: the test
        # split's (train-inherited unless overridden; explicit null deletes)
        test_cfg = data_cfg.get("test", {})
        mask_cfg = test_cfg["mask"] if "mask" in test_cfg else \
            data_cfg.get("train", {}).get("mask")
        klass = DKGenerator if model_name == "dk" else STDKGenerator
        return klass.from_config(
            cfg, length=sample_length,
            shared_batch_mask=(mask_cfg or {}).get("type") == "stis")
    return build_generator(cfg)


def build_discriminator(cfg: Dict[str, Any]) -> nn.Module:
    model_cfg = cfg.get("model", {})
    model_name = str(model_cfg.get("name", "simple")).lower()
    in_channels = model_cfg.get("in_channels", 1)
    base_channels = model_cfg.get("base_channels", 64)

    if model_name == "p2igan":
        data_cfg = cfg.get("data_loader") or cfg.get("data", {}).get("train", {})
        sample_length = data_cfg.get("sample_length", 16) or 16
        # Optional: run the D's 3D branch in bf16 (measured +11% GAN
        # steps/sec, PROFILE.md "D 3D branch bf16"). f32 default = reference
        # parity: the reference autocasts only the GENERATOR
        # (models/p2igan.py:85-86); its discriminator runs full precision.
        import jax.numpy as jnp
        d3d = str(model_cfg.get("disc_branch3d_dtype", "float32"))
        return P2IDiscriminator(in_channels=in_channels * sample_length,
                                branch3d_dtype=jnp.dtype(d3d))
    return SimpleDiscriminator(in_channels=in_channels, base_channels=base_channels)


__all__ = [
    "build_generator",
    "build_generator_for_inference",
    "build_discriminator",
    "SimpleGenerator",
    "SimpleDiscriminator",
    "P2IGenerator",
    "P2IDiscriminator",
    "DKGenerator",
    "STDKGenerator",
]
