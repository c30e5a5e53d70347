"""pyrapose-tpu: TPU-native single-shot RGB 6D object pose estimation.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
sThalham/PyraPose (RetinaNet-style detector with dense 3D-bounding-box-corner
regression, P3 segmentation mask head, and PnP-based pose recovery), designed
for TPU: static shapes everywhere, batched on-device RANSAC-PnP, data-parallel
training over an ICI mesh via jax.sharding.
"""

__version__ = "0.1.0"
