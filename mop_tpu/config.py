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
        # Fused multi-hop/two-hop and quartet kernels: opt-in. Model-level
        # min-of-3 on v5e shows XLA autofusion beats the per-(B,H) whole-matrix
        # kernel for these (ViTMultiHop eval fwd 5.2ms XLA vs 11.2ms fused);
        # only the edgewise-lowrank kernel wins (22.1 vs 36.3ms, 1.65x).
        self.fused_multihop = _env_flag("MOP_TPU_FUSED_MULTIHOP", False)
        self.fused_quartet = _env_flag("MOP_TPU_FUSED_QUARTET", False)
        # Fused edgewise backward (in-kernel VJP) at train time. Default set
        # by measurement on v5e (see benchmarks/edgewise_train_kernel.md).
        self.fused_edgewise_train = _env_flag(
            "MOP_TPU_FUSED_EDGEWISE_TRAIN", True)
        # Routed (sorted, capacity-bounded) MoE instead of compute-all-experts.
        self.routed_moe = _env_flag("MOP_TPU_ROUTED_MOE", True)


config = _Config()


def _setup_compilation_cache() -> None:
    """Opt-in persistent XLA compilation cache (MOP_TPU_COMPILE_CACHE=<dir>).

    Caches compiled executables across processes, cutting the ~13 s XLA
    compile of the 5M train step on repeat runs (the per-process executable
    load through the tunnel is not cacheable). Set to a directory path to
    enable; unset/empty disables. Safe to call before backend init."""
    cache_dir = os.environ.get("MOP_TPU_COMPILE_CACHE", "")
    if not cache_dir:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - best effort
        pass


_setup_compilation_cache()


def use_fused_attention() -> bool:
    return config.fused_attention


def use_routed_moe() -> bool:
    return config.routed_moe


def use_fused_multihop() -> bool:
    return config.fused_multihop


def use_fused_quartet() -> bool:
    return config.fused_quartet


def use_fused_edgewise_train() -> bool:
    return config.fused_edgewise_train
