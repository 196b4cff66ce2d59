from depth_estimation_tpu.ops.resize import (
    interp_matrix,
    resize2d,
    resize_bicubic,
    resize_bilinear,
)

__all__ = ["interp_matrix", "resize2d", "resize_bicubic", "resize_bilinear"]
