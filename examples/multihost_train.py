#!/usr/bin/env python
"""Multi-host data-parallel training worker: one OS process per "host".

Each process owns a disjoint set of devices, loads ONLY its own rows of the
global batch, and runs the same GSPMD train step; gradients all-reduce
across processes (gloo on CPU, ICI/DCN on real pods). The reference is
single-device-only (SURVEY §0), so this file has no counterpart there — it
is the mop-tpu scaling demo and the worker under
``tools/launch_multihost.py`` / ``tests/test_multihost.py``.

Run standalone (single process, all local devices):
    python examples/multihost_train.py --steps 3

Run as a 2-process multihost job on one machine (4 virtual CPU devices per
process, collectives over localhost gloo):
    python tools/launch_multihost.py --nproc 2 --devices-per-process 4 -- \
        python examples/multihost_train.py --steps 3

On a real pod, launch one copy per host with MOP_TPU_COORDINATOR /
MOP_TPU_NUM_PROCESSES / MOP_TPU_PROCESS_ID set (or rely on TPU cluster
auto-detection by calling jax.distributed.initialize yourself) and drop
--platform/--devices flags.

The last stdout line is a JSON record {process, loss, acc, param_l2} —
identical across processes (replicated state), pinned against a
single-process run in tests/test_multihost.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def run_worker(steps: int = 3, global_batch_size: int = 16, dim: int = 32,
               depth: int = 1, heads: int = 2, lr: float = 1e-3) -> dict:
    """Train a tiny ViT-MoP for ``steps`` fp32 steps on deterministic
    synthetic data, sharded over every device of every participating
    process. Deterministic given the process topology-independent data
    stream: every process generates the FULL global batch from the same
    seed and contributes only its own rows, so any (1, 2, 4, ...)-process
    run of the same global batch computes the same training trajectory (up
    to cross-process reduction order)."""
    import jax
    import numpy as np
    import optax

    from mop_tpu.models import ViT_MoP
    from mop_tpu.ops.preprocess import CIFAR100_MEAN, CIFAR100_STD
    from mop_tpu.parallel import make_classifier_train_step
    from mop_tpu.parallel.multihost import (global_batch,
                                            make_multihost_mesh,
                                            process_batch_slice,
                                            replicate_multihost)

    mesh = make_multihost_mesh()
    model = ViT_MoP(dim=dim, depth=depth, heads=heads, n_classes=10,
                    n_views=2, n_kernels=2)
    rng = jax.random.PRNGKey(0)
    # Host-side init (identical on every process: same key, deterministic
    # functional init), then replicated collectively onto the global mesh.
    params = jax.device_get(model.init(
        {"params": rng, "dropout": rng},
        np.zeros((2, 3, 32, 32), np.float32), train=True))
    tx = optax.adamw(lr)
    opt_state = jax.device_get(tx.init(params))

    with mesh:
        gparams = replicate_multihost(params, mesh)
        gopt = replicate_multihost(opt_state, mesh)
        step = make_classifier_train_step(
            model, tx, mesh, CIFAR100_MEAN, CIFAR100_STD, augment=False,
            compute_dtype=None)
        rs = np.random.RandomState(0)
        sl = process_batch_slice(global_batch_size)
        m = {}
        for k in range(steps):
            x = rs.randint(0, 256, (global_batch_size, 3, 32, 32),
                           dtype=np.uint8)
            y = rs.randint(0, 10, (global_batch_size,)).astype(np.int32)
            xg, yg = global_batch((x[sl], y[sl]), mesh, global_batch_size)
            krng = replicate_multihost(
                np.asarray(jax.device_get(jax.random.fold_in(rng, k))),
                mesh)
            gparams, gopt, m = step(gparams, gopt, xg, yg, krng)
        import jax.numpy as jnp

        param_l2 = jax.jit(
            lambda p: jnp.sqrt(sum(
                jnp.sum(jnp.square(x)) for x in
                jax.tree_util.tree_leaves(p)
                if jnp.issubdtype(x.dtype, jnp.floating))))(gparams)
        return {
            "process": jax.process_index(),
            "n_processes": jax.process_count(),
            "n_devices": len(jax.devices()),
            "loss": float(m["loss"]),
            "acc": float(m["acc"]),
            "param_l2": float(param_l2),
        }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--global-batch", type=int, default=16)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--depth", type=int, default=1)
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--platform", default=os.environ.get("MOP_TPU_PLATFORM"),
                    help="force a jax platform (e.g. cpu) before backend init")
    ap.add_argument("--devices", type=int, default=0,
                    help="force this many virtual host-platform devices "
                         "(XLA_FLAGS, CPU testing only)")
    args = ap.parse_args(argv)

    if args.devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from mop_tpu.parallel.multihost import init_distributed

    init_distributed()
    out = run_worker(steps=args.steps, global_batch_size=args.global_batch,
                     dim=args.dim, depth=args.depth, heads=args.heads)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
