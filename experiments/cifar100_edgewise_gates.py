#!/usr/bin/env python
"""CIFAR-100 edgewise-gated attention experiment (TPU-native).

Flag/output parity with reference ``experiments/cifar100_edgewise_gates.py``
(the richest Edgewise variant: share_qkv per-view scales, Q/K lens bank,
mlp_ratio; imported by the ab5/imagenet/tournament runners in the reference).
Fixes a reference bug where the parsed lens-bank flags were never passed to
the model (reference :543-558); here they are honored. CSV
``cifar100_edgewise_gates.csv`` with ``seed,acc``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments._single_model import base_argparser, run_single_model_seeds
from mop_tpu.models import ViTEdgewise


def main():
    ap = base_argparser(1500, 250, "results/cifar100_edgewise_gates", 8)
    ap.add_argument("--beta_not", type=float, default=0.5)
    ap.add_argument("--ew_gate_mode", type=str, default="dense",
                    choices=["dense", "lowrank"])
    ap.add_argument("--ew_gate_rank", type=int, default=4)
    ap.add_argument("--ew_gate_init", type=str, default="neutral",
                    choices=["neutral", "and", "or", "chain"])
    ap.add_argument("--use_lens_bank_qk", action="store_true")
    ap.add_argument("--lens_qk_kernel_size", type=int, default=3)
    ap.add_argument("--lens_qk_dilations", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--lens_qk_causal", action="store_true")
    # S-channel lens bank (model superset; reference
    # attention_variants.py:427-442): depthwise Conv2d over the stacked
    # score maps per dilation.
    ap.add_argument("--use_lens_bank", action="store_true")
    ap.add_argument("--lens_kernel_size", type=int, default=3)
    ap.add_argument("--lens_dilations", type=int, nargs="+", default=[1, 2])
    args = ap.parse_args()

    def factory():
        return ViTEdgewise(
            dim=args.dim, depth=args.depth, heads=args.heads,
            n_classes=100, drop_path=args.drop_path,
            beta_not=args.beta_not,
            use_k3=True,
            share_qkv=args.use_lens_bank_qk,  # QK lens bank requires shared QKV
            gate_mode=args.ew_gate_mode,
            gate_rank=args.ew_gate_rank,
            gate_init=args.ew_gate_init,
            use_lens_bank_qk=args.use_lens_bank_qk,
            lens_qk_kernel_size=args.lens_qk_kernel_size,
            lens_qk_dilations=tuple(args.lens_qk_dilations),
            lens_qk_causal=args.lens_qk_causal,
            use_lens_bank=args.use_lens_bank,
            lens_kernel_size=args.lens_kernel_size,
            lens_dilations=tuple(args.lens_dilations),
        )

    run_single_model_seeds(args, "cifar100", factory, "cifar100_edgewise_gates.csv")


if __name__ == "__main__":
    main()
