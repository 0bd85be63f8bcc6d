from .idw_kernel import idw_3d_knn_pallas  # noqa: F401
from .decode_mask import decode_normalize_mask  # noqa: F401
