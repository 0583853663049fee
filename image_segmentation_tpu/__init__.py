"""TPU-native image-segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
MattiDeBeer/image-segmentation reference (PyTorch/CUDA):

- Oxford-IIIT-Pet semantic segmentation (background / cat / dog), image
  reconstruction autoencoders, CLIP-conditioned segmentation, point-prompt
  ("SAM-style") segmentation, and a systematic robustness/perturbation
  evaluation battery.

Design stance (TPU-first, not a port):

- Models are flax.linen modules in NHWC layout; parameters live in fp32,
  compute runs in bfloat16 on the MXU.
- Training is ONE jitted, buffer-donated step: on-device augmentation ->
  forward -> loss -> grad -> optimizer update.  No per-batch host syncs.
- Data parallelism is a `jax.sharding.Mesh` with the batch dimension sharded;
  gradient reduction is an XLA `psum` over ICI (replaces DDP/NCCL).
- The host pipeline ships uint8 tensors; normalization, augmentation and the
  full perturbation battery are device-side kernels (Pallas where hot).

Subpackages
-----------
- ``data``      dataset loading, synthetic fixtures, host->device pipeline,
                integer-space perturbation battery
- ``models``    UNet / LargeUNet / autoencoder / CLIP-fusion / prompt models
- ``ops``       losses & metrics, augmentation kernels, Pallas cross-attention
- ``parallel``  mesh construction and sharding helpers
- ``engine``    Trainer / Evaluator / export APIs + artifact logging
- ``utils``     run folders, CSV/JSON artifacts, checkpoints, plotting,
                profiling
"""

__version__ = "0.1.0"
