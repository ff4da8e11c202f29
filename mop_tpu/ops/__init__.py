"""Functional compute ops: attention-score algebra, fused Pallas kernels,
on-device preprocessing, MoE routing, and the log-mel frontend."""

from . import attention, fused, mel, moe, preprocess, quant, ring_attention

__all__ = ["attention", "fused", "mel", "moe", "preprocess", "quant",
           "ring_attention"]
