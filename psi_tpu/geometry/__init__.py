from psi_tpu.geometry.rot6d import (
    rot6d_to_matrix,
    matrix_to_rot6d,
    aa_to_matrix,
    matrix_to_aa,
    aa_to_rot6d,
    rot6d_to_aa,
)
from psi_tpu.geometry.camera import (
    normalize_global_T,
    recover_global_T,
    verts_transform,
)
from psi_tpu.geometry.bodyvec import (
    convert_to_6D_rot,
    convert_to_3D_rot,
    body_params_encapsulate,
    body_params_parse,
    BODY72_LAYOUT,
)

__all__ = [
    "rot6d_to_matrix",
    "matrix_to_rot6d",
    "aa_to_matrix",
    "matrix_to_aa",
    "aa_to_rot6d",
    "rot6d_to_aa",
    "normalize_global_T",
    "recover_global_T",
    "verts_transform",
    "convert_to_6D_rot",
    "convert_to_3D_rot",
    "body_params_encapsulate",
    "body_params_parse",
    "BODY72_LAYOUT",
]
