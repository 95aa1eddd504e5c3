"""ssl_cr_histo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
annotation-efficient histopathology image analysis.

A ground-up re-design of the capabilities of srinidhiPY/SSL_CR_Histo
("Self-Supervised Driven Consistency Training for Annotation Efficient
Histopathology Image Analysis", Medical Image Analysis 2021):

  1. RSP pretraining   — resolution-sequence-prediction pretext task on
                         multi-resolution WSI patch triplets.
  2. SSL fine-tuning   — supervised fine-tuning with limited labels.
  3. SSL_CR            — teacher/student consistency training with
                         weak/strong augmentation (FixMatch-style).

Architecture (TPU-first, not a port):
  ops/       on-device augmentation & color kernels (vmapped JAX + Pallas)
  models/    flax ResNet backbones + triplet / classifier heads
  parallel/  device mesh + pjit train/eval steps (DP over the `data` axis)
  train/     optimizers (Lookahead), LR schedules, checkpointing
  data/      WSI pyramid IO, RSP triplet sampling, datasets, host prefetch
  eval/      metrics (ICC, F1, AUC, ...) and WSI heatmap inference
  cli/       reference-compatible command-line entry points
"""

__version__ = "0.1.0"
