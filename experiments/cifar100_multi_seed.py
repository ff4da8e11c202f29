#!/usr/bin/env python
"""CIFAR-100 multi-seed A-vs-B experiment (TPU-native).

Flag/output parity with reference ``experiments/cifar100_multi_seed.py``:
fixed dim=256/depth=8/heads=4 configs, steps=1500 default, CSV
``cifar100_acc.csv`` with ``seed,baseline,mop,diff``.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments import common as C
from mop_tpu.models import ViT_Baseline, ViT_MoP
from mop_tpu.parallel import make_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--weight_decay", type=float, default=5e-2)
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--out", type=str, default="results/cifar100")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    print(f"Device: {C.get_device_str()}")
    mesh = make_mesh()
    train_iter_f, val_batches, _, mean, std, _ = C.get_loaders(
        "cifar100", args.batch, tiny=args.tiny, val_frac=0.0,
        synthetic=args.synthetic,
    )

    accs_base, accs_mop = [], []
    for s in args.seeds:
        print(f"\nRunning experiment with seed {s}")
        C.set_seed(s)
        runs = {
            "b": C.ModelRun(
                "b", ViT_Baseline(dim=256, depth=8, heads=4, n_classes=100),
                args.lr, mesh, mean, std, args.steps, 0.0, args.weight_decay, seed=s,
            ),
            "m": C.ModelRun(
                "m", ViT_MoP(dim=256, depth=8, heads=4, n_classes=100,
                             n_views=5, n_kernels=3),
                args.lr, mesh, mean, std, args.steps, 0.0, args.weight_decay, seed=s,
            ),
        }
        print(f"Baseline params: {runs['b'].n_params:,}")
        print(f"MoP params: {runs['m'].n_params:,}")

        C.lockstep_train(runs, train_iter_f(s), val_batches, args.steps,
                         args.eval_every, mesh)
        with mesh:
            a_b = runs["b"].evaluate(val_batches())
            a_m = runs["m"].evaluate(val_batches())
        accs_base.append(a_b)
        accs_mop.append(a_m)
        print(f"seed {s}: baseline={a_b:.4f}  mop={a_m:.4f}  diff={a_m - a_b:+.4f}")
        if s == args.seeds[-1]:
            import json
            with mesh:
                ca = runs["b"].per_sample_correct(val_batches())
                cb = runs["m"].per_sample_correct(val_batches())
            summary = {
                "seed": s,
                "params_base": runs["b"].n_params,
                "params_mop": runs["m"].n_params,
                "test_acc_A": float(ca.mean()),
                "test_acc_B": float(cb.mean()),
                **C.mcnemar(ca, cb),
                **C.bootstrap_delta(ca, cb),
            }
            with open(os.path.join(args.out, "summary.json"), "w") as f:
                json.dump(summary, f, indent=2)

    csv_path = os.path.join(args.out, "cifar100_acc.csv")
    C.save_csv(csv_path, ["seed", "baseline", "mop", "diff"],
               [[args.seeds[i], f"{b:.4f}", f"{m:.4f}", f"{m - b:.4f}"]
                for i, (b, m) in enumerate(zip(accs_base, accs_mop))])

    mean_base, mean_mop = np.mean(accs_base), np.mean(accs_mop)
    print(f"\nFinal Results (across {len(args.seeds)} seeds):")
    print(f"Baseline: {mean_base:.4f} ± {np.std(accs_base):.4f}")
    print(f"MoP:      {mean_mop:.4f} ± {np.std(accs_mop):.4f}")
    print(f"Diff:     {mean_mop - mean_base:+.4f}")
    print(f"Results saved to: {csv_path}")


if __name__ == "__main__":
    main()
