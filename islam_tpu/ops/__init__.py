from islam_tpu.ops.geometry import (
    make_intrinsics_layer,
    pixel2point,
    point2pixel,
    reprojerr,
    scale_from_disp_flow,
    edge_mask,
)
from islam_tpu.ops.correlation import correlation, correlation_reference
from islam_tpu.ops.warp import flow_warp, grid_sample
