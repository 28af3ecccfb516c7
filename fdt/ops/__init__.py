from fdt.ops.pallas_nms import pallas_nms_keep

__all__ = ["pallas_nms_keep"]
