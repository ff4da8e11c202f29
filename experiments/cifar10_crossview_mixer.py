#!/usr/bin/env python
"""CIFAR-10 cross-view mixer experiment (TPU-native).

Flag/output parity with reference ``experiments/cifar10_crossview_mixer.py``:
ViTCrossView (2-view binding, 2x2 learnable mixer, transpose cues, optional
per-key prior); CSV ``cifar10_crossview_mixer.csv`` with ``seed,acc``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments._single_model import base_argparser, run_single_model_seeds
from mop_tpu.models import ViTCrossView


def main():
    ap = base_argparser(1000, 200, "results/cifar10_crossview_mixer", 6)
    ap.add_argument("--use_transpose_cues", action="store_true")
    ap.add_argument("--t1", type=float, default=0.0)
    ap.add_argument("--t2", type=float, default=0.0)
    ap.add_argument("--enable_prior", action="store_true")
    ap.add_argument("--prior_weight", type=float, default=0.5)
    ap.add_argument("--anchor_mode", type=str,
                    choices=["argmax_row_sum", "fixed", "none"],
                    default="argmax_row_sum")
    ap.add_argument("--k_star", type=int, default=0)
    args = ap.parse_args()

    def factory():
        return ViTCrossView(
            dim=args.dim, depth=args.depth, heads=args.heads,
            n_classes=10, drop_path=args.drop_path,
            use_transpose_cues=args.use_transpose_cues,
            t1=args.t1, t2=args.t2,
            enable_per_key_prior=args.enable_prior,
            prior_weight=args.prior_weight,
            anchor_mode=args.anchor_mode,
            fixed_k_star=args.k_star,
        )

    run_single_model_seeds(args, "cifar10", factory, "cifar10_crossview_mixer.csv")


if __name__ == "__main__":
    main()
