"""Compatibility facade mirroring the reference's ``p2igan_bench.modules``
import surface (``from p2igan_bench.modules import ReconstructionLoss,
gan_loss`` and the layer exports of ``modules/layer.py:410-426``), so users
porting scripts find the same names in one place."""

from .losses import (  # noqa: F401
    ReconstructionLoss,
    compute_forward_difference,
    gan_loss,
    k1_loss,
    kl_divergence,
    reconstruction_loss,
    shock_map,
    shock_map_loss,
    softmax_temperature,
    spatial_pool,
    temporal_difference_matching_loss,
    transform,
    weighted_l1_distance,
)
from .ops.doconv import DOConv2d, SimAM, fold_doconv  # noqa: F401
from .ops.layers import (  # noqa: F401
    AttentionBlock,
    BasicConv,
    BasicConvDO,
    FFTBenchComplexConv,
    InputBlock,
    LayerNorm2d,
    ResBlockDO,
    ResBlockDOFFT,
    STABEDBlock,
    UPPos,
    downsample_duplicate_channels,
)
from .ops.spectral_norm import C2, C3, SNConv  # noqa: F401
