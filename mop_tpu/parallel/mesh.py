"""Device mesh + sharding helpers — the ICI data-parallel layer.

The reference has no distributed support at all (single device,
``cifar100_ab5_param_budgets.py:43-48``). This module is the TPU-native
first-class equivalent BASELINE.json requires: a 1-D (or 2-D) jax.sharding
Mesh over ICI, batch-axis sharding for inputs, replicated parameters, and XLA
collectives inserted automatically by pjit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
STAGE_AXIS = "stage"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    model_parallel=1 gives pure data parallelism (the BASELINE.json target
    config for v5e-8: batch-axis sharding over ICI, replicated params).

    Multi-process aware: when launched under the multihost env contract
    (``MOP_TPU_COORDINATOR``/``MOP_TPU_NUM_PROCESSES``/``MOP_TPU_PROCESS_ID``
    — e.g. via ``tools/launch_multihost.py``), the distributed runtime is
    bootstrapped and the mesh spans every process's devices with a DCN-safe
    layout (model axes never cross a process). Every experiment CLI
    therefore runs multi-host unchanged; see docs/SCALING.md.
    """
    from .multihost import init_distributed

    if init_distributed() and n_devices is None and devices is None:
        from .multihost import make_multihost_mesh

        if jax.process_count() > 1:
            return make_multihost_mesh(model_parallel=model_parallel)
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"make_mesh: requested n_devices={n_devices} but only "
                f"{len(devs)} devices are available "
                f"({[str(d) for d in devs]}). A silent truncation here would "
                f"fake multi-chip validation on fewer chips."
            )
        devs = devs[:n_devices]
    n = len(devs)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_mesh3(
    n_devices: Optional[int] = None,
    tensor_parallel: int = 1,
    pipeline_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'model', 'stage') mesh for COMPOSED dp x tp x pp: tensor
    parallelism (GSPMD over 'model') inside pipeline stages ('stage',
    manual shard_map), with the batch sharded over 'data'."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"make_mesh3: requested n_devices={n_devices} but only "
                f"{len(devs)} devices are available."
            )
        devs = devs[:n_devices]
    n = len(devs)
    mp = tensor_parallel * pipeline_parallel
    assert n % mp == 0, (n, tensor_parallel, pipeline_parallel)
    arr = np.asarray(devs).reshape(n // mp, tensor_parallel, pipeline_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, STAGE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spans_processes(mesh: Mesh) -> bool:
    return len({d.process_index for d in mesh.devices.flat}) > 1


def shard_batch(batch, mesh: Mesh):
    """Place host arrays on the mesh with the batch axis sharded.

    On a multi-process mesh every process passes the SAME full global
    batch (experiment data streams are seed-deterministic, so each process
    generates it identically); each contributes only its own rows via
    ``make_array_from_process_local_data``. Single-process: a device_put.
    """
    s = batch_sharding(mesh)
    if _spans_processes(mesh):
        import numpy as np

        from .multihost import process_batch_slice

        def _mk(a):
            a = np.asarray(a)
            return jax.make_array_from_process_local_data(
                s, a[process_batch_slice(a.shape[0])])

        return jax.tree_util.tree_map(_mk, batch)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), batch)


def replicate(tree, mesh: Mesh):
    """Replicate host values onto every mesh device (multi-process aware:
    identical host values required on each process — deterministic init)."""
    if _spans_processes(mesh):
        from .multihost import replicate_multihost

        return replicate_multihost(jax.device_get(tree), mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, replicated(mesh)), tree)
