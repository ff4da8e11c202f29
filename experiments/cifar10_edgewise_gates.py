#!/usr/bin/env python
"""CIFAR-10 edgewise-gated attention experiment (TPU-native).

Flag/output parity with reference ``experiments/cifar10_edgewise_gates.py``
(the v1 script whose ViTEdgewise the reference tests import): dense/lowrank
gate heads with presets; CSV ``cifar10_edgewise_gates.csv`` with ``seed,acc``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments._single_model import base_argparser, run_single_model_seeds
from mop_tpu.models import ViTEdgewise


def main():
    ap = base_argparser(1000, 200, "results/cifar10_edgewise_gates", 6)
    ap.add_argument("--beta_not", type=float, default=0.5)
    ap.add_argument("--ew_gate_mode", type=str, default="dense",
                    choices=["dense", "lowrank"])
    ap.add_argument("--ew_gate_rank", type=int, default=4)
    ap.add_argument("--ew_gate_init", type=str, default="neutral",
                    choices=["neutral", "and", "or", "not", "nor", "xor", "chain"])
    args = ap.parse_args()

    def factory():
        return ViTEdgewise(
            dim=args.dim, depth=args.depth, heads=args.heads,
            n_classes=10, drop_path=args.drop_path,
            beta_not=args.beta_not,
            gate_mode=args.ew_gate_mode,
            gate_rank=args.ew_gate_rank,
            gate_init=args.ew_gate_init,
        )

    run_single_model_seeds(args, "cifar10", factory, "cifar10_edgewise_gates.csv")


if __name__ == "__main__":
    main()
