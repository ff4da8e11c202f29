#!/usr/bin/env python
"""CIFAR-10 MoP hyperparameter sweep over views x kernels (TPU-native).

Flag/output parity with reference ``experiments/cifar10_mop_sweep.py``:
B-only grid over ``--views x --kernels`` per seed; CSV
``cifar10_mop_sweep.csv`` with ``seed,views,kernels,acc`` plus aggregate print.
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments import common as C
from mop_tpu.models import ViT_MoP
from mop_tpu.parallel import make_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--weight_decay", type=float, default=5e-2)
    ap.add_argument("--eval_every", type=int, default=200)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--views", type=int, nargs="+", default=[3, 5, 7])
    ap.add_argument("--kernels", type=int, nargs="+", default=[2, 3, 4])
    ap.add_argument("--out", type=str, default="results/cifar10_mop_sweep")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    print(f"Device: {C.get_device_str()}")
    mesh = make_mesh()
    train_iter_f, val_batches, _, mean, std, _ = C.get_loaders(
        "cifar10", args.batch, tiny=args.tiny, val_frac=0.0,
        synthetic=args.synthetic,
    )

    results = []
    for seed in args.seeds:
        for n_views, n_kernels in itertools.product(args.views, args.kernels):
            cfg_name = f"seed{seed}_v{n_views}_k{n_kernels}"
            print(f"\nRunning {cfg_name}")
            C.set_seed(seed)
            run = C.ModelRun(
                "m",
                ViT_MoP(dim=256, depth=6, heads=4, n_classes=10,
                        n_views=n_views, n_kernels=n_kernels),
                args.lr, mesh, mean, std, args.steps, 0.0,
                args.weight_decay, seed=seed,
            )
            print(f"Params: {run.n_params:,}")
            C.lockstep_train({"m": run}, train_iter_f(seed), val_batches,
                             args.steps, args.eval_every, mesh)
            with mesh:
                final_acc = run.evaluate(val_batches())
            results.append((seed, n_views, n_kernels, final_acc))
            print(f"done {cfg_name}: acc={final_acc:.4f}")

    csv_path = os.path.join(args.out, "cifar10_mop_sweep.csv")
    C.save_csv(csv_path, ["seed", "views", "kernels", "acc"],
               [[s, v, k, f"{a:.4f}"] for s, v, k, a in results])

    grouped = {}
    for s, v, k, a in results:
        grouped.setdefault((v, k), []).append(a)
    for (v, k), accs in sorted(grouped.items()):
        print(f"views={v:2d} kernels={k:2d} | acc={float(np.mean(accs)):.4f} "
              f"± {float(np.std(accs)):.4f} (n={len(accs)})")
    print(f"Results saved to: {csv_path}")


if __name__ == "__main__":
    main()
