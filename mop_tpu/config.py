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
        # Fused multi-hop kernel: ON with shape-aware dispatch. Crossover
        # measured on v5e (benchmarks/parked_kernels.md): the kernel engages
        # only at N >= 256 where it wins 1.23-1.76x; XLA keeps N <= 128
        # (CIFAR shapes), where it wins 1.2-1.3x.
        self.fused_multihop = _env_flag("MOP_TPU_FUSED_MULTIHOP", True)
        # Fused quartet kernel: ON by default since bf16 MXU operands — GPT
        # quartet LM eval fwd (n_embd=384, T=256, batch 64): 10.15 ms XLA vs
        # 8.61 ms fused = 1.18x (same doc). Grad-safe: custom VJP recomputes
        # the backward via the reference composition (XLA autodiff).
        self.fused_quartet = _env_flag("MOP_TPU_FUSED_QUARTET", True)
        # Fused edgewise backward (in-kernel VJP) at train time. Default set
        # by measurement on v5e (see benchmarks/edgewise_train_kernel.md).
        self.fused_edgewise_train = _env_flag(
            "MOP_TPU_FUSED_EDGEWISE_TRAIN", True)
        # Routed (sorted, capacity-bounded) MoE instead of compute-all-experts.
        self.routed_moe = _env_flag("MOP_TPU_ROUTED_MOE", True)
        # Whisper decode dispatch: below this text-context length the
        # full-window re-decode beats the sequential KV-cached loop.
        # Measured round 5 (benchmarks/decode.md "dispatch" sections):
        # at the real-Whisper 1500-frame audio shape full wins at ctx
        # <= 64 (cached 0.85x) and cached wins from ctx 128 (1.28-1.32x)
        # -> default crossover 96. At SMALL audio contexts (256 frames)
        # cached wins everywhere measured (2.0-3.9x from ctx 32) — set
        # MOP_TPU_WHISPER_CACHED_MIN_CTX=0 for such deployments.
        # whisper_transcribe_auto() picks cached at max_tokens >= this.
        self.whisper_cached_min_ctx = int(os.environ.get(
            "MOP_TPU_WHISPER_CACHED_MIN_CTX", "96"))
        # Explicit pallas-interpret override for the fused kernels'
        # custom-VJP backward passes (traced AFTER any
        # force_tpu_interpret_mode context has exited). None = auto-detect
        # from jax's context manager (best-effort over a private attribute);
        # True/False forces. Public escape hatch if a jax upgrade moves the
        # private attribute.
        self.pallas_interpret = None


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


def _setup_platform() -> None:
    """``MOP_TPU_PLATFORM=cpu`` forces the jax platform before backend init
    (the JAX_PLATFORMS env var alone can be too late: this environment's
    sitecustomize imports jax at interpreter startup). Set by
    ``tools/launch_multihost.py`` so every experiment CLI can run under an
    emulated multi-process pod topology on CPU unchanged."""
    plat = os.environ.get("MOP_TPU_PLATFORM", "")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:  # pragma: no cover - backend already initialized
        pass


_setup_platform()


def _setup_distributed() -> None:
    """Bootstrap ``jax.distributed`` at import when the multihost env
    contract is present (MOP_TPU_COORDINATOR / MOP_TPU_NUM_PROCESSES /
    MOP_TPU_PROCESS_ID — the ``tools/launch_multihost.py`` contract).

    Must run before ANY backend use, which is why it lives here (every
    experiment CLI imports mop_tpu first) instead of inside make_mesh.
    ``mop_tpu.parallel.multihost.init_distributed`` detects this
    bootstrap and is a no-op afterwards."""
    coord = os.environ.get("MOP_TPU_COORDINATOR")
    nproc = os.environ.get("MOP_TPU_NUM_PROCESSES")
    pid = os.environ.get("MOP_TPU_PROCESS_ID")
    if not (coord and nproc and pid) or int(nproc) < 2:
        return
    import jax

    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # pragma: no cover - older jax
        pass
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=int(nproc),
                               process_id=int(pid))


_setup_distributed()


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


def whisper_cached_min_ctx() -> int:
    return config.whisper_cached_min_ctx
