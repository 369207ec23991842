"""fcvsr_tpu — TPU-native JAX framework for frequency-aware compressed video
super-resolution (FCVSR) and its model zoo.

A from-scratch rebuild of the capabilities of QZ1-boy/FCVSR (IEEE TMM 2026)
designed TPU-first: NHWC layouts, XLA-fused functional ops, Pallas kernels for
the hot paths, and `jax.sharding` data parallelism over device meshes.

Layer map (mirrors reference SURVEY.md §1, rebuilt for TPU):
  ops/       functional op library (FFT alignment, adaptive conv, band split…)
  models/    flax.linen model definitions (FCVSR, FCVSR-S, zoo)
  data/      clip datasets + frame-index/augmentation pipelines
  parallel/  mesh construction + sharded train/eval steps
  train/     losses, LR schedules, training loop
  metrics/   PSNR / SSIM / tOF evaluation
  utils/     config system, checkpointing (orbax + torch converter), logging
"""

__version__ = "0.1.0"
