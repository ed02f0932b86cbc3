"""margipose_tpu: a TPU-native framework for 3D human pose estimation.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference PyTorch implementation of "3D Human Pose Estimation with 2D
Marginal Heatmaps" (arXiv:1806.01484).

Layout:
  ops/       pure-function numerics (DSNT, losses, torch-parity convs, image warps)
  geometry/  camera model, skeleton math, normalisation, invertible 2D transforms
  models/    Flax model definitions + versioned factory registry
  data/      dataset loaders, augmentation, host->device input pipeline
  train/     pjit train/eval steps, optax schedules, checkpointing, meters
  parallel/  device mesh + sharding rules
  bin/       CLI subcommands (train / eval / infer / gui / hyperparams ...)
"""

__version__ = "0.1.0"
