from psi_tpu.body.lbs import lbs, batch_rigid_transform, blend_shapes, vertices2joints
from psi_tpu.body.smplx_model import (
    SMPLXModel,
    load_smplx_npz,
    synthetic_smplx,
    smplx_forward,
)
from psi_tpu.body.vposer import VPoser, vposer_decode, synthetic_vposer_params

__all__ = [
    "lbs",
    "batch_rigid_transform",
    "blend_shapes",
    "vertices2joints",
    "SMPLXModel",
    "load_smplx_npz",
    "synthetic_smplx",
    "smplx_forward",
    "VPoser",
    "vposer_decode",
    "synthetic_vposer_params",
]
