"""Roofline ablations for the CIFAR headline train step (benchmarks/roofline.md).

Times the full scanned train step at the 5M ViT-MoP benchmark config under
controlled variations (augment on/off, fp32 vs bf16, A vs B, 2x depth,
2x dim) to separate matmul-bound from memory-bound time. Min-of-3 windows,
host-transfer barrier.

Usage: python tools/bench_ablation.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(model, batch, mesh, tx, augment=True, compute_dtype="bf16",
          scan=10, windows=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mop_tpu.ops.preprocess import CIFAR100_MEAN, CIFAR100_STD
    from mop_tpu.parallel import (make_scanned_classifier_train_step,
                                  replicate, shard_batch)
    from mop_tpu.utils import jitted_init

    dt = jnp.bfloat16 if compute_dtype == "bf16" else None
    rng = jax.random.PRNGKey(0)
    xk = np.random.RandomState(0).randint(
        0, 256, (scan, batch, 3, 32, 32), dtype=np.uint8)
    yk = np.random.RandomState(1).randint(0, 100, (scan, batch)).astype(np.int32)
    params = jitted_init(model, {"params": rng, "dropout": rng},
                         jnp.zeros((batch, 3, 32, 32)), train=True)
    p = replicate(params, mesh)
    o = replicate(tx.init(params), mesh)
    xb, yb = shard_batch((xk, yk), mesh)
    step = make_scanned_classifier_train_step(
        model, tx, mesh, CIFAR100_MEAN, CIFAR100_STD, unroll_steps=scan,
        augment=augment, compute_dtype=dt)
    with mesh:
        for i in range(3):
            p, o, m = step(p, o, xb, yb, jax.random.fold_in(rng, i))
        float(m["loss"][-1])
        ts = []
        for w in range(windows):
            t0 = time.perf_counter()
            for i in range(10):
                p, o, m = step(p, o, xb, yb,
                               jax.random.fold_in(rng, 100 + w * 10 + i))
            float(m["loss"][-1])
            ts.append((time.perf_counter() - t0) / (10 * scan) * 1e3)
    return min(ts)


def main():
    import optax

    from mop_tpu.models import ViT_Baseline, ViT_MoP
    from mop_tpu.parallel import make_mesh

    mesh = make_mesh()
    tx = optax.adamw(3e-3, weight_decay=0.05)
    B5 = dict(dim=224, depth=6, heads=4, n_classes=100, n_views=5, n_kernels=3)

    rows = []

    def add(name, ms, note):
        rows.append((name, ms, note))
        log(f"{name}: {ms:.3f} ms/step  ({note})")

    base = bench(ViT_MoP(**B5), 256, mesh, tx)
    add("full train step (bf16, augment)", base, "baseline")
    add("augment off", bench(ViT_MoP(**B5), 256, mesh, tx, augment=False),
        "augmentation cost")
    add("fp32 compute",
        bench(ViT_MoP(**B5), 256, mesh, tx, compute_dtype="fp32"),
        "bf16 leverage -> matmul-bound fraction")
    add("ViT_Baseline (A, no MoP gate)",
        bench(ViT_Baseline(dim=224, depth=6, heads=4, n_classes=100),
              256, mesh, tx), "MoP gate cost")
    add("depth 12 (2x blocks)",
        bench(ViT_MoP(**{**B5, "depth": 12}), 256, mesh, tx),
        "per-block scaling / fixed overhead")
    add("dim 448 (4x matmul FLOPs)",
        bench(ViT_MoP(**{**B5, "dim": 448}), 256, mesh, tx),
        "dim-quadratic vs dim-linear split")

    print(json.dumps({
        "config": B5, "batch": 256,
        "rows": [{"variant": n, "ms_per_step": round(ms, 3), "note": t}
                 for n, ms, t in rows],
    }))


if __name__ == "__main__":
    main()
