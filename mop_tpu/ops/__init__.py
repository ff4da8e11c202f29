"""Functional compute ops: attention-score algebra, fused Pallas kernels,
on-device preprocessing, and MoE routing."""

from . import attention

__all__ = ["attention"]
