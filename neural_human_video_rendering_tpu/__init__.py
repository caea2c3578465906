"""TPU-native neural human video rendering framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
SunYangtian/Neural-Human-Video-Rendering (arXiv:2106.14132): person-specific
human video generation and pose transfer driven by OpenPose keypoints and
optional LaplaceProj 3D pose labels, rendered through a learned per-part
texture atlas with online background/mask refinement.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):
  data/      pose JSON parsing, label rasterization (jit-able), datasets
  models/    flax.linen generators / discriminators / VGG / renderer
  ops/       grid-sample texture warp: jnp reference + Pallas TPU kernel
  losses/    GAN, feature-matching, VGG-perceptual, recon, temporal
  parallel/  device mesh + sharding helpers (data-parallel over ICI)
  train/     jitted train steps + stage drivers (UV pretrain, e2e, tex)
  infer/     keypoints -> frames inference driver (test.py equivalent)
  utils/     checkpointing, HTML/TensorBoard visualizer, image I/O
"""

__version__ = "0.1.0"
