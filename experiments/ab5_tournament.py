#!/usr/bin/env python
"""A/B/C/D/E tournament on CIFAR-100 (TPU-native).

Flag/output parity with reference ``experiments/ab5_tournament.py``: reuses
the ab5 param-matching + lockstep machinery (the reference imports helpers
from ``cifar100_ab5_param_budgets.py`` the same way, :289-295), defaults to
5 seeds / 1 target, and supports ``--plan_only`` heuristic sizing for >=1B
budgets without instantiation (:270-315). CSV ``tournament_target_{N}.csv``.
"""

from __future__ import annotations

import os
import sys
from typing import Dict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.cifar100_ab5_param_budgets import build_argparser, run


def heuristic_plan_1b(target_params: int) -> Dict[str, Dict[str, int]]:
    """Indicative large-budget configs, no instantiation (reference :270-290)."""
    plans: Dict[str, Dict[str, int]] = {}
    if target_params >= 1_000_000_000:
        plans["A"] = {"dim": 1280, "depth": 32, "heads": 16}
        plans["B"] = {"dim": 1280, "depth": 32, "heads": 16}
        plans["C"] = {"dim": 1280, "depth": 32, "heads": 16}
        plans["D"] = {"dim": 1152, "depth": 36, "heads": 16}
        plans["E"] = {"dim": 1024, "depth": 40, "heads": 16}
    else:
        plans["A"] = {"dim": 768, "depth": 12, "heads": 12}
        plans["B"] = {"dim": 768, "depth": 12, "heads": 12}
        plans["C"] = {"dim": 768, "depth": 12, "heads": 12}
        plans["D"] = {"dim": 640, "depth": 16, "heads": 10}
        plans["E"] = {"dim": 640, "depth": 16, "heads": 10}
    return plans


def main():
    ap = build_argparser()
    ap.set_defaults(
        seeds=[0, 1, 2, 3, 4],
        targets=[5_000_000],
        out="results/ab5_tournament",
    )
    ap.add_argument("--plan_only", action="store_true",
                    help="Do not train; print per-model planned configs and exit.")
    args = ap.parse_args()

    if args.plan_only:
        os.makedirs(args.out, exist_ok=True)
        for target in args.targets:
            plan = heuristic_plan_1b(int(target))
            print(f"Tournament target parameters: {int(target):,}")
            print("Planned per-model configs (heuristic, no instantiation):")
            for k in args.models:
                print(f"  {k}: {plan.get(k, {})}")
            with open(os.path.join(args.out, f"tournament_plan_{int(target)}.txt"), "w") as f:
                for k in args.models:
                    f.write(f"{k}: {plan.get(k, {})}\n")
        return

    run(args, csv_prefix="tournament")


if __name__ == "__main__":
    main()
