#!/usr/bin/env python
"""CIFAR-10 A/B parameter-budget experiment (TPU-native).

Flag/output parity with reference ``experiments/cifar10_ab_param_budgets.py``: grid-match A to
each ``--targets`` budget, match B under A's budget, lockstep train per seed,
CSV ``cifar10_ab_target_{N}.csv``.
"""

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
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--weight_decay", type=float, default=5e-2)
    ap.add_argument("--eval_every", type=int, default=200)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--targets", type=int, nargs="+", default=[5_000_000, 50_000_000])
    ap.add_argument("--mop_views", type=int, default=5)
    ap.add_argument("--mop_kernels", type=int, default=3)
    ap.add_argument("--out", type=str, default="results/cifar10_ab_param_budgets")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    print(f"Device: {C.get_device_str()}")
    mesh = make_mesh()
    train_iter_f, val_batches, _, mean, std, _ = C.get_loaders(
        "cifar10", args.batch, tiny=args.tiny, val_frac=0.0, synthetic=args.synthetic,
    )

    for target in args.targets:
        print(f"\nTarget parameters: {int(target):,}")
        base_cfg, base_p = C.find_config_for_target(
            ViT_Baseline, n_classes=10, target_params=int(target)
        )
        mop_cfg, mop_p, within = C.find_model_config_match_baseline(
            ViT_MoP, n_classes=10, target_params=int(target),
            baseline_cfg=base_cfg, baseline_params=base_p, max_ratio_diff=0.01,
            extra_kwargs={"n_views": args.mop_views, "n_kernels": args.mop_kernels},
        )
        print(f"Baseline cfg: {base_cfg} | params={base_p:,}")
        print(f"MoP cfg     : {mop_cfg} | params={mop_p:,} (within 1%: {within})")

        accs_base, accs_mop = [], []
        for s in args.seeds:
            print(f"\nSeed {s}")
            C.set_seed(s)
            runs = {
                "b": C.ModelRun("b", ViT_Baseline(n_classes=10, **base_cfg),
                                args.lr, mesh, mean, std, args.steps, 0.0,
                                args.weight_decay, seed=s),
                "m": C.ModelRun("m", ViT_MoP(n_classes=10, **mop_cfg,
                                             n_views=args.mop_views,
                                             n_kernels=args.mop_kernels),
                                args.lr, mesh, mean, std, args.steps, 0.0,
                                args.weight_decay, seed=s),
            }
            C.lockstep_train(runs, train_iter_f(s), val_batches, args.steps,
                             args.eval_every, mesh)
            with mesh:
                a_b = runs["b"].evaluate(val_batches())
                a_m = runs["m"].evaluate(val_batches())
            accs_base.append(a_b)
            accs_mop.append(a_m)
            print(f"seed {s}: baseline={a_b:.4f}  mop={a_m:.4f}  diff={a_m - a_b:+.4f}")

        csv_path = os.path.join(args.out, f"cifar10_ab_target_{int(target)}.csv")
        C.save_csv(
            csv_path,
            ["seed", "baseline_acc", "mop_acc", "diff", "baseline_params",
             "mop_params", "baseline_cfg", "mop_cfg"],
            [[s, f"{accs_base[i]:.4f}", f"{accs_mop[i]:.4f}",
              f"{accs_mop[i] - accs_base[i]:.4f}", base_p, mop_p,
              f'"{base_cfg}"', f'"{mop_cfg}"']
             for i, s in enumerate(args.seeds)],
        )
        mean_diff = float(np.mean(accs_mop)) - float(np.mean(accs_base))
        print(f"\nBaseline: {float(np.mean(accs_base)):.4f} ± {float(np.std(accs_base)):.4f}")
        print(f"MoP:      {float(np.mean(accs_mop)):.4f} ± {float(np.std(accs_mop)):.4f}")
        print(f"Diff:     {mean_diff:+.4f}")
        print(f"Results saved to: {csv_path}")


if __name__ == "__main__":
    main()
