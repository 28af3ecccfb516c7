from fdt.ops.pallas_nms import pallas_nms_keep
from fdt.ops.quant import Int8Conv, quant_mode, quantized

__all__ = ["pallas_nms_keep", "Int8Conv", "quant_mode", "quantized"]
