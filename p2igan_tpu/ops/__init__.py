from .convs import (  # noqa: F401
    conv1d,
    conv2d,
    conv3d,
    conv_transpose2d,
    conv_transpose3d,
    max_pool2d,
    avg_pool2d,
    bilinear_upsample2x_align_corners,
    bilinear_resize_align_false,
)
from .doconv import compose_doconv_kernel, fold_doconv, DOConv2d  # noqa: F401
from .wendland import wendland_c2, build_phi_space, build_phi_time  # noqa: F401
from .idw import idw_3d_knn, grid_points  # noqa: F401
