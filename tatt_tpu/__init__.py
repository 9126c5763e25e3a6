"""tatt_tpu — a TPU-native scene-text image super-resolution framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of TATT
("A Text Attention Network for Spatial Deformation Robust Scene Text Image
Super-Resolution", CVPR 2022): text-prior-guided SR on TextZoom, with the
TSRN backbone family, the TP-Interpreter cross-attention module, STN/TPS
rectification, CRNN/ASTER/MORAN recognizers, and the full loss/metric stack.

Layout:
  core/     typed config tree, charsets, mesh + sharding, checkpointing
  kernels/  Pallas/XLA kernels: BiGRU scan, fused cross-attention,
            grid_sample, CTC loss
  models/   flax.linen model zoo (TSRN/TATT, baselines, recognizers)
  losses/   image (MSE + gradient prior), SSIM family, distill, CTC
  data/     LMDB-compatible storage, collate as pure functions, host pipeline
  train/    jitted train/eval steps, loops, metrics, observability
  cli/      main entry mirroring the reference's flags
"""

__version__ = "0.1.0"
