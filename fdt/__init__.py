"""fdt — a TPU-native face detection & tracking framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
limacv/Face-detection-and-tracking (PyTorch/CUDA reference):

- three detector families: MTCNN cascade, FaceBoxes, PyramidBox
  (ResNet50 + MobileNet try1/try2/try3/try4/try5 backbones)
- WIDER-FACE training / evaluation (PR & ROC curves)
- offline multi-face IoU tracking on video

Layering (bottom → top):
  fdt.geometry   pure-JAX box algebra: IoU / encode / decode / fixed-shape NMS / matching
  fdt.anchors    vectorized prior generation (SSD-style + FaceBoxes densified)
  fdt.models     flax.linen model zoo (NHWC, bf16-capable)
  fdt.infer      jitted end-to-end detection (preprocess → forward → decode → NMS)
  fdt.data       WIDER anno parsing, datasets, augmentation (host-side)
  fdt.train      losses, optimizers, train loops, distillation
  fdt.track      IoU tracker + playback
  fdt.eval       PR/ROC metric harness, .npy dumps compatible with the reference
  fdt.dist       mesh / sharding / collectives (data parallelism over ICI)
  fdt.ops        Pallas TPU kernels for the hot post-processing ops
"""

__version__ = "0.3.0"
