#!/usr/bin/env python
"""CIFAR-100 multi-hop gated-attention experiment (TPU-native).

Flag/output parity with reference ``experiments/cifar100_multihop_gates.py``:
ViTMultiHop (gated multi-hop score composition + chained value transport) with fixed scalar logic
gates from the CLI; CSV ``cifar100_multihop_gates.csv`` with ``seed,acc``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments._single_model import base_argparser, run_single_model_seeds
from mop_tpu.models import ViTMultiHop


def main():
    ap = base_argparser(1500, 250, "results/cifar100_multihop_gates", 8)
    ap.add_argument("--beta_not", type=float, default=0.5)
    ap.add_argument("--hops", type=int, default=3)
    ap.add_argument("--gate_base", type=float, default=1.0)
    ap.add_argument("--gate_and", type=float, default=1.0)
    ap.add_argument("--gate_or", type=float, default=0.0)
    ap.add_argument("--gate_not", type=float, default=0.0)
    ap.add_argument("--gate_chain", type=float, default=0.0)
    args = ap.parse_args()

    gates = dict(base=args.gate_base, and_=args.gate_and, or_=args.gate_or,
                 not_=args.gate_not, chain=args.gate_chain)

    def factory():
        return ViTMultiHop(
            dim=args.dim, depth=args.depth, heads=args.heads,
            n_classes=100, drop_path=args.drop_path,
            beta_not=args.beta_not, gates=gates, hops=args.hops,
        )

    run_single_model_seeds(args, "cifar100", factory, "cifar100_multihop_gates.csv")


if __name__ == "__main__":
    main()
