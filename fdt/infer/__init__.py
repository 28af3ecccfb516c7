from fdt.infer.detect import ssd_detect
from fdt.infer.facebox import FaceBoxDetector

__all__ = ["ssd_detect", "FaceBoxDetector"]
