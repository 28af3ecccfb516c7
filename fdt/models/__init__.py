from fdt.models.facebox import FaceBox
from fdt.models.torch_convert import torch_to_flax, load_torch_state_dict

__all__ = ["FaceBox", "torch_to_flax", "load_torch_state_dict"]
