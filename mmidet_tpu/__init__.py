"""mmidet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-modal (visible+infrared)
object-detection framework with the capabilities of MMI-Det (IEEE TCSVT 2024).

Design stance (vs. the PyTorch reference at joewybean/MMI-Det):
  * functional flax models built from a declarative config registry (no ``eval``)
  * NHWC layout everywhere (TPU conv native layout)
  * a single jitted train step: forward + aux fusion losses + detection loss +
    grad + optimizer + EMA, sharded over a ``jax.sharding.Mesh`` ("data" axis
    replaces DDP/NCCL; cross-replica BatchNorm is implicit under GSPMD)
  * fixed shapes end to end: padded labels, padded fixed-``max_det`` NMS,
    so XLA compiles once
  * bf16 compute on TPU (no AMP GradScaler needed)
"""

__version__ = "0.1.0"
