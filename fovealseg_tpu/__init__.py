"""fovealseg_tpu — TPU-native foveated instance segmentation (FovealSeg/FSNet rebuild).

A from-scratch JAX/XLA/Pallas framework with the capabilities of
SAI-Lab-NYU/Foveated-Instance-Segmentation: gaze-conditioned saliency,
learn-to-downsample deformation grids, foveated warping, HRNetV2/SegFormer/
DeepLab segmentation of the warped image, and full-resolution inverse warping
with hole filling. See SURVEY.md for the reference structural analysis.
"""

__version__ = "0.1.0"
