"""Global runtime configuration for mop-tpu.

Feature flags (env-overridable) selecting between fused Pallas kernels and
the pure-JAX reference path. The reference semantics are always available;
fused kernels are numerically equivalent up to float reassociation.
"""

from __future__ import annotations

import os

_TRUTHY = ("1", "true", "yes", "on")


def _env_flag(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.lower() in _TRUTHY


class _Config:
    def __init__(self):
        # Fused Pallas flash attention for single-view attention paths.
        self.fused_attention = _env_flag("MOP_TPU_FUSED_ATTENTION", True)
        # Routed (sorted, capacity-bounded) MoE instead of compute-all-experts.
        self.routed_moe = _env_flag("MOP_TPU_ROUTED_MOE", True)


config = _Config()


def use_fused_attention() -> bool:
    return config.fused_attention


def use_routed_moe() -> bool:
    return config.routed_moe
