"""Core tensor ops (L0/L1): TPU-native replacements for the reference's
native CUDA/CuPy kernels and torch.nn.functional primitives.

All ops use NHWC layout (TPU-native) unless noted. Flow tensors follow the
reference convention: last channel dim is (u, v) = (x-displacement,
y-displacement) in pixels.
"""

from motif_tpu.ops.warp import (  # noqa: F401
    grid_sample,
    backwarp,
    bilinear_sampler,
    flow_warp,
)
from motif_tpu.ops.resize import (  # noqa: F401
    interpolate_bilinear,
    resize_matrix_linear,
    imresize_matlab,
    avg_pool2d,
)
from motif_tpu.ops.softsplat import (  # noqa: F401
    splat_sum,
    splat_max,
    splat_count,
    softmax_splat,
)
from motif_tpu.ops.dcn import dcn_v2  # noqa: F401
from motif_tpu.ops.corr import (  # noqa: F401
    all_pairs_corr,
    corr_pyramid,
    corr_lookup,
    local_corr,
)
