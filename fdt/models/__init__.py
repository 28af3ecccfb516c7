from fdt.models.facebox import FaceBox
from fdt.models.inception_resnet_v2 import InceptionResnetV2
from fdt.models.torch_convert import torch_to_flax, load_torch_state_dict

__all__ = ["FaceBox", "InceptionResnetV2", "torch_to_flax",
           "load_torch_state_dict"]
