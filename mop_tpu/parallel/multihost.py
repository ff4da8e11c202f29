"""Multi-host (multi-process) training: process bootstrap, DCN-aware meshes,
and per-process global-batch assembly.

The reference is strictly single-device (SURVEY §0: ``cuda -> mps -> cpu``
fallback, reference ``experiments/cifar100_ab5_param_budgets.py:43-48``) and
has no distributed backend at all. On TPU pods, scaling past one host means
one JAX process per host, each owning its local chips: gradient collectives
ride ICI within a slice and DCN across slices, so the mesh must be laid out
with the *model* axes inside a host/slice and only the *data* axis crossing
process boundaries.

Three pieces, each usable alone:

- :func:`init_distributed` — process bootstrap (``jax.distributed``),
  env-var friendly, idempotent, with CPU gloo collectives auto-selected so
  the multi-process path is testable on a laptop/CI without TPUs.
- :func:`make_multihost_mesh` — a ('data', 'model') mesh whose model axis
  never crosses a process boundary (model groups = consecutive local
  devices; data-major across processes, so the batch axis is the only one
  riding DCN).
- :func:`global_batch` / :func:`replicate_multihost` — per-process input
  assembly: each process supplies only its own rows of the global batch
  (``jax.make_array_from_process_local_data``); parameters are replicated
  from identical host values (same seed on every process — functional init
  is deterministic).

The existing jitted train steps (``make_classifier_train_step`` etc.) work
unchanged on the resulting mesh: they are GSPMD programs over global arrays,
and XLA partitions them per process. Verified end-to-end by
``tests/test_multihost.py``, which spawns two REAL OS processes (4 virtual
CPU devices each, gloo collectives over localhost) and pins train-step
equality against a single-process 8-device run.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import DATA_AXIS, MODEL_AXIS, batch_sharding, replicated

_initialized = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Initialize ``jax.distributed`` for multi-process execution.

    Arguments default to the ``MOP_TPU_COORDINATOR`` /
    ``MOP_TPU_NUM_PROCESSES`` / ``MOP_TPU_PROCESS_ID`` environment variables
    (the launcher contract of ``tools/launch_multihost.py``). Returns True
    if the distributed runtime was (or already is) initialized, False when
    neither arguments nor env vars request it — single-process runs are a
    no-op, so library code can call this unconditionally.

    On the CPU backend the cross-process collective implementation is set
    to gloo (the only one available there); TPU backends keep their native
    ICI/DCN collectives. Must run before the backend initializes (i.e.
    before the first array op), like ``jax.distributed.initialize`` itself.
    """
    global _initialized
    if _initialized:
        return True
    try:  # already bootstrapped (e.g. mop_tpu.config at import)? no-op.
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            _initialized = True
            return True
    except Exception:  # pragma: no cover - private-module fallback
        pass
    coordinator_address = coordinator_address or os.environ.get(
        "MOP_TPU_COORDINATOR")
    if num_processes is None and "MOP_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["MOP_TPU_NUM_PROCESSES"])
    if process_id is None and "MOP_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["MOP_TPU_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False  # single-process: nothing to do
    if num_processes is not None and num_processes < 2:
        return False
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # pragma: no cover - older jax without the option
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def make_multihost_mesh(model_parallel: int = 1) -> Mesh:
    """('data', 'model') mesh over ALL processes' devices, DCN-safe.

    Devices are ordered process-major, so the leading (data) axis is the
    only one whose neighbors cross a process boundary: every
    ``model_parallel``-sized model group is a run of consecutive devices
    local to one process (tensor-parallel collectives stay on ICI; the
    gradient all-reduce crosses DCN once per step, which is the standard
    pod recipe). ``model_parallel`` must divide the per-process device
    count for that guarantee to hold — validated here rather than left to
    a confusing GSPMD error.

    Single-process, this reduces exactly to :func:`make_mesh`.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_proc = jax.process_count()
    n_local = len(devs) // n_proc
    counts: dict = {}
    for d in devs:
        counts[d.process_index] = counts.get(d.process_index, 0) + 1
    if len(set(counts.values())) != 1:
        raise ValueError(
            f"make_multihost_mesh: uneven device counts per process "
            f"{counts} — the data axis cannot be laid out process-major.")
    if model_parallel < 1 or n_local % model_parallel != 0:
        raise ValueError(
            f"make_multihost_mesh: model_parallel={model_parallel} must "
            f"divide the per-process device count {n_local}; a model group "
            f"crossing a process boundary would put tensor-parallel "
            f"collectives on DCN.")
    arr = np.asarray(devs).reshape(len(devs) // model_parallel,
                                   model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def process_batch_slice(global_batch_size: int) -> slice:
    """The rows of the global batch THIS process must supply to
    :func:`global_batch`. Process-major data layout (see
    :func:`make_multihost_mesh`) means process p owns the contiguous rows
    ``[p * B/P, (p+1) * B/P)``."""
    n_proc = jax.process_count()
    if global_batch_size % n_proc != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"process count {n_proc}")
    per = global_batch_size // n_proc
    p = jax.process_index()
    return slice(p * per, (p + 1) * per)


def global_batch(local_tree, mesh: Mesh, global_batch_size: Optional[int] = None):
    """Assemble a GLOBAL batch-sharded array from per-process local rows.

    ``local_tree``: this process's rows only (see
    :func:`process_batch_slice`); every process must call this
    collectively. Leaves become global ``jax.Array``s sharded over the
    mesh's data axis. Single-process this is just a sharded device_put.
    """
    sh = batch_sharding(mesh)

    def _mk(x):
        x = np.asarray(x)
        if global_batch_size is not None:
            expect = global_batch_size // jax.process_count()
            if x.shape[0] != expect:
                raise ValueError(
                    f"global_batch: leaf has {x.shape[0]} local rows, "
                    f"expected {expect} (global {global_batch_size} over "
                    f"{jax.process_count()} processes)")
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree_util.tree_map(_mk, local_tree)


def replicate_multihost(tree, mesh: Mesh):
    """Replicate host values onto every device of a multi-process mesh.

    Every process must hold IDENTICAL host values (deterministic: init
    params with the same PRNG key on each process) and call this
    collectively. Single-process it equals :func:`mesh.replicate`.
    """
    rep = replicated(mesh)

    def _mk(x):
        return jax.make_array_from_process_local_data(rep, np.asarray(x))

    return jax.tree_util.tree_map(_mk, tree)
