"""hvrnet_tpu — a TPU-native video object detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of HVRNet
("Mining Inter-Video Proposal Relations for Video Object Detection",
ECCV 2020) and its SELSA baseline: Faster R-CNN R101-C5 detection,
temporal RoI-relation attention heads, triplet-video hard mining, the
ImageNet-VID data/eval stack, and a pjit/mesh-parallel training engine.
"""

__version__ = "0.1.0"
