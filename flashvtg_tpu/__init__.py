"""flashvtg_tpu — a TPU-native (JAX/XLA/Pallas) framework for video temporal grounding.

Re-architecture of FlashVTG (WACV 2025, reference: mspercieve/FlashVTG) for TPUs:
joint Moment Retrieval (MR) and Highlight Detection (HD) over pre-extracted
video/text features on QVHighlights, Charades-STA, TACoS, TVSum and YouTube-HL.

Layering (mirrors SURVEY.md §7):
  ops/      pure jnp/numpy math: spans, IoU, NMS, padding, fused attention kernels
  eval/     standalone metric suite (bit-compatible with standalone_eval/eval.py)
  data/     jsonl + feature input pipeline with static-shape bucketing
  models/   flax.linen network (transformer, pyramid, heads, decode)
  losses/   training criterion (bundle + saliency losses)
  train/    config system, train/eval loops, checkpointing
  parallel/ device-mesh / sharding helpers
"""

__version__ = "0.1.0"
