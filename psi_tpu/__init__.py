"""psi_tpu — TPU-native framework for generating 3D people in scenes.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
yz-cnsdqz/PSI-release ("Generating 3D People in Scenes without People",
CVPR 2020): scene-conditioned CVAEs over SMPL-X body parameters, a
differentiable SMPL-X/VPoser body-mesh decoder, scene-geometry losses
(Chamfer contact + SDF collision), scene-aware fitting refinement, and
the PROX-E / MP3D-R evaluation protocol — all designed TPU-first:

* compute path: jit-compiled XLA programs, Pallas kernels for the
  Chamfer nearest-neighbour and trilinear SDF-gather hot ops;
* scale axis: the *population of bodies* is vmapped and sharded over a
  ``jax.sharding.Mesh`` (the reference fits one body at a time on one
  GPU; here ``fit`` runs hundreds of bodies per chip as one program);
* training: data-parallel via sharding annotations + psum over ICI.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level convenience API (keeps `import psi_tpu` light)."""
    _map = {
        "HumanCVAES1": "psi_tpu.models",
        "HumanCVAES2": "psi_tpu.models",
        "SMPLXModel": "psi_tpu.body",
        "load_smplx_npz": "psi_tpu.body",
        "smplx_forward": "psi_tpu.body",
        "VPoser": "psi_tpu.body",
        "SceneAssets": "psi_tpu.train",
        "TrainOP": "psi_tpu.train",
        "FittingOP": "psi_tpu.fit",
        "fit_bodies": "psi_tpu.fit",
        "TestOP": "psi_tpu.gen",
        "generate_bodies": "psi_tpu.gen",
        "GenerationEngine": "psi_tpu.serve",
        "chamfer_distance": "psi_tpu.ops",
        "sdf_trilinear": "psi_tpu.ops",
    }
    if name in _map:
        import importlib

        return getattr(importlib.import_module(_map[name]), name)
    raise AttributeError(f"module 'psi_tpu' has no attribute {name!r}")
