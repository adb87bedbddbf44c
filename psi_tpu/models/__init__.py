from psi_tpu.models.resnet import ResNet18Trunk
from psi_tpu.models.scene_encoder import SceneEncoder
from psi_tpu.models.cvae_s1 import HumanCVAES1
from psi_tpu.models.cvae_s2 import HumanCVAES2, BodyGlobalPoseVAE, BodyLocalPoseVAE

__all__ = [
    "ResNet18Trunk",
    "SceneEncoder",
    "HumanCVAES1",
    "HumanCVAES2",
    "BodyGlobalPoseVAE",
    "BodyLocalPoseVAE",
]
