"""ssd_tpu — a TPU-native single-shot detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``TropComplique/single-shot-detector`` (see SURVEY.md): SSD/RetinaNet-family
detectors (MobileNet-v1 / ShuffleNet-v2 / ResNet-50 backbones + FPN + shared
subnets) with on-device anchor matching, focal + smooth-L1 training, a Pallas
on-chip NMS kernel, data-parallel training over a device mesh, orbax
checkpointing, and the reference's public inference contract
``predict(image) -> {boxes, scores, labels, num_boxes}``.
"""

__version__ = "0.1.0"

from ssd_tpu.config import Config  # noqa: F401
