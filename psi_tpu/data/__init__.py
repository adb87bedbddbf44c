from psi_tpu.data.scenes import SceneRegistry, load_scene_registry, synthetic_scene_registry
from psi_tpu.data.preprocessing import data_preprocessing
from psi_tpu.data.hdf5 import BatchGeneratorWithSceneMesh, PROX_SCENES, PROX_TRAIN_SCENES, PROX_TEST_SCENES
from psi_tpu.data.synthetic import SyntheticBatchGenerator, make_synthetic_assets

__all__ = [
    "SceneRegistry",
    "load_scene_registry",
    "synthetic_scene_registry",
    "data_preprocessing",
    "BatchGeneratorWithSceneMesh",
    "PROX_SCENES",
    "PROX_TRAIN_SCENES",
    "PROX_TEST_SCENES",
    "SyntheticBatchGenerator",
    "make_synthetic_assets",
]
