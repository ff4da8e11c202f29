#!/usr/bin/env python
"""CIFAR-100 two-hop parameter-budget experiment (TPU-native).

Flag/output parity with reference ``experiments/cifar100_twohop_param_budgets.py``: budget-matched
ViTGated runs per target; CSV ``cifar100_twohop_target_{N}.csv`` with ``seed,acc``.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments import common as C
from mop_tpu.models import ViTGated
from mop_tpu.parallel import make_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--weight_decay", type=float, default=5e-2)
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--targets", type=int, nargs="+", default=[5_000_000, 50_000_000])
    ap.add_argument("--gate_base", type=float, default=1.0)
    ap.add_argument("--gate_and", type=float, default=1.0)
    ap.add_argument("--gate_or", type=float, default=0.0)
    ap.add_argument("--gate_not", type=float, default=0.0)
    ap.add_argument("--gate_chain", type=float, default=0.0)
    ap.add_argument("--beta_not", type=float, default=0.5)
    ap.add_argument("--out", type=str, default="results/cifar100_twohop_param_budgets")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    print(f"Device: {C.get_device_str()}")
    mesh = make_mesh()
    train_iter_f, val_batches, _, mean, std, _ = C.get_loaders(
        "cifar100", args.batch, tiny=args.tiny, val_frac=0.0, synthetic=args.synthetic,
    )

    gates = dict(base=args.gate_base, and_=args.gate_and, or_=args.gate_or,
                 not_=args.gate_not, chain=args.gate_chain)
    extra = dict(gates=gates, beta_not=args.beta_not)

    for target in args.targets:
        print(f"\nTarget parameters: {int(target):,}")
        cfg, p = C.find_config_for_target(
            ViTGated, n_classes=100, target_params=int(target), extra_kwargs=extra)
        print(f"Config: {cfg} | params={p:,}")

        accs = []
        for s in args.seeds:
            print(f"\nSeed {s}")
            C.set_seed(s)
            run = C.ModelRun(
                "m", ViTGated(n_classes=100, **cfg, **extra),
                args.lr, mesh, mean, std, args.steps, 0.0, args.weight_decay, seed=s)
            print(f"Params: {run.n_params:,}")
            C.lockstep_train({"m": run}, train_iter_f(s), val_batches,
                             args.steps, args.eval_every, mesh)
            with mesh:
                a = run.evaluate(val_batches())
            accs.append(a)
            print(f"seed {s}: acc={a:.4f}")

        csv_path = os.path.join(args.out, f"cifar100_twohop_target_{int(target)}.csv")
        C.save_csv(csv_path, ["seed", "acc"],
                   [[s, f"{accs[i]:.4f}"] for i, s in enumerate(args.seeds)])
        print(f"\nFinal: {float(np.mean(accs)):.4f} ± {float(np.std(accs)):.4f}")
        print(f"Results saved to: {csv_path}")


if __name__ == "__main__":
    main()
