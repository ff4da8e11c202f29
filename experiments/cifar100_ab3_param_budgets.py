#!/usr/bin/env python
"""CIFAR-100 A/B/C parameter-budget experiment (TPU-native).

Flag/output parity with reference ``experiments/cifar100_ab3_param_budgets.py``: grid-match A,
match the others under A's budget, lockstep train per seed,
CSV ``cifar100_ab3_target_{N}.csv``.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments import common as C
from mop_tpu.models import ViT_Baseline, ViT_MoP, ViTCrossView
from mop_tpu.parallel import make_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--lr_large", type=float, default=1e-3)
    ap.add_argument("--large_threshold", type=int, default=50_000_000)
    ap.add_argument("--warmup_frac", type=float, default=0.1)
    ap.add_argument("--weight_decay", type=float, default=5e-2)
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--targets", type=int, nargs="+", default=[5_000_000, 50_000_000])
    ap.add_argument("--mop_views", type=int, default=5)
    ap.add_argument("--mop_kernels", type=int, default=3)
    ap.add_argument("--xview_transpose", action="store_true")
    ap.add_argument("--xview_t1", type=float, default=0.0)
    ap.add_argument("--xview_t2", type=float, default=0.0)
    ap.add_argument("--xview_enable_prior", action="store_true")
    ap.add_argument("--xview_prior_weight", type=float, default=0.5)
    ap.add_argument("--xview_anchor_mode", type=str,
                    choices=["argmax_row_sum", "fixed", "none"],
                    default="argmax_row_sum")
    ap.add_argument("--xview_k_star", type=int, default=0)
    ap.add_argument("--out", type=str, default="results/cifar100_ab3_param_budgets")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    print(f"Device: {C.get_device_str()}")
    mesh = make_mesh()
    train_iter_f, val_batches, _, mean, std, _ = C.get_loaders(
        "cifar100", args.batch, tiny=args.tiny, val_frac=0.0, synthetic=args.synthetic,
    )

    xview_extra = dict(
        use_transpose_cues=args.xview_transpose, t1=args.xview_t1, t2=args.xview_t2,
        enable_per_key_prior=args.xview_enable_prior,
        prior_weight=args.xview_prior_weight,
        anchor_mode=args.xview_anchor_mode, fixed_k_star=args.xview_k_star,
    )

    for target in args.targets:
        print(f"\nTarget parameters: {int(target):,}")
        lr_current = args.lr if int(target) < int(args.large_threshold) else args.lr_large
        base_cfg, base_p = C.find_config_for_target(
            ViT_Baseline, n_classes=100, target_params=int(target))
        mop_cfg, mop_p, _ = C.find_model_config_match_baseline(
            ViT_MoP, n_classes=100, target_params=int(target),
            baseline_cfg=base_cfg, baseline_params=base_p, max_ratio_diff=0.01,
            extra_kwargs={"n_views": args.mop_views, "n_kernels": args.mop_kernels})
        xview_cfg, xview_p, _ = C.find_model_config_match_baseline(
            ViTCrossView, n_classes=100, target_params=int(target),
            baseline_cfg=base_cfg, baseline_params=base_p, max_ratio_diff=0.01,
            extra_kwargs=xview_extra)

        print(f"Baseline cfg: {base_cfg} | params={base_p:,}")
        print(f"MoP cfg     : {mop_cfg} | params={mop_p:,}")
        print(f"XView cfg   : {xview_cfg} | params={xview_p:,}")

        KEYS = ["base", "mop", "xview"]
        accs = {k: [] for k in KEYS}
        for s in args.seeds:
            print(f"\nSeed {s}")
            C.set_seed(s)
            runs = {
                "base": C.ModelRun("base", ViT_Baseline(n_classes=100, **base_cfg),
                                   lr_current, mesh, mean, std, args.steps,
                                   args.warmup_frac, args.weight_decay, seed=s),
                "mop": C.ModelRun("mop", ViT_MoP(n_classes=100, **mop_cfg,
                                                 n_views=args.mop_views,
                                                 n_kernels=args.mop_kernels),
                                  lr_current, mesh, mean, std, args.steps,
                                  args.warmup_frac, args.weight_decay, seed=s),
                "xview": C.ModelRun("xview", ViTCrossView(n_classes=100, **xview_cfg,
                                                          **xview_extra),
                                    lr_current, mesh, mean, std, args.steps,
                                    args.warmup_frac, args.weight_decay, seed=s),
            }
            C.lockstep_train(runs, train_iter_f(s), val_batches, args.steps,
                             args.eval_every, mesh)
            with mesh:
                for k in KEYS:
                    accs[k].append(runs[k].evaluate(val_batches()))
            print("seed", s, " ".join(f"{k}={accs[k][-1]:.4f}" for k in KEYS))

        csv_path = os.path.join(args.out, f"cifar100_ab3_target_{int(target)}.csv")
        C.save_csv(
            csv_path,
            ["seed"] + [f"acc_{k}" for k in KEYS]
            + [f"params_{k}" for k in KEYS] + ["base_cfg", "mop_cfg", "xview_cfg", "xview_extra"],
            [[s] + [f"{accs[k][i]:.4f}" for k in KEYS] + [base_p, mop_p, xview_p] + [f'\"{base_cfg}\"', f'\"{mop_cfg}\"', f'\"{xview_cfg}\"', f'\"{xview_extra}\"']
             for i, s in enumerate(args.seeds)],
        )
        print("\n" + " | ".join(
            f"{k}={float(np.mean(v)):.4f}±{float(np.std(v)):.4f}"
            for k, v in accs.items()))
        print(f"Results saved to: {csv_path}")


if __name__ == "__main__":
    main()
