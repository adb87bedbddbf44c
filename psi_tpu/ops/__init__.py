from psi_tpu.ops.chamfer import (
    chamfer_distance,
    chamfer_distance_reference,
    chamfer_one_sided,
    chamfer_with_idx,
)
from psi_tpu.ops.sdf import sdf_trilinear, grid_sample_3d
from psi_tpu.ops.resize import resize_bilinear

__all__ = [
    "chamfer_distance",
    "chamfer_distance_reference",
    "chamfer_one_sided",
    "chamfer_with_idx",
    "sdf_trilinear",
    "grid_sample_3d",
    "resize_bilinear",
]
