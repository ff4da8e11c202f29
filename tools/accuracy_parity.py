#!/usr/bin/env python
"""Accuracy-parity experiment: torch reference vs mop-tpu on identical data.

Trains ViT_Baseline (A) and ViT_MoP (B) in BOTH frameworks on the same
deterministic synthetic CIFAR (identical batch composition per step, same
schedule/normalization, no augmentation) and compares final test accuracies.
BASELINE.json asks for reference-matching accuracy; with no real CIFAR in this
zero-egress environment, this controlled same-data comparison is the
verifiable equivalent.

Round 5 (VERDICT r4 item 4): the original easy-task run saturated (every
cell 1.0000 — a parity check that cannot fail). ``--hard`` runs the
discriminative version: synthetic-HARD CIFAR-100 (difficulty blends class
templates + noise, benchmarks/abcde_hard methodology) at the 5M abcd_5m.log
B config (dim 224, depth 6, heads 4, views 5, kernels 3), a few hundred
steps, 3+ seeds — accuracies land mid-range, so a real accuracy bug in
either framework WOULD show, and the quantity compared is the reference's
own headline: the A/B delta (does MoP beat baseline by the same margin in
both frameworks? ref abcd_5m.log methodology). Writes
benchmarks/ab_hard/cross_framework.{csv,md}.

Usage: python tools/accuracy_parity.py --hard [--steps 250] [--seeds 0 1 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = os.environ.get("MOP_REFERENCE", "/root/reference")

MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32).reshape(1, 3, 1, 1)
STD = np.array([0.2470, 0.2435, 0.2616], np.float32).reshape(1, 3, 1, 1)

DIM, DEPTH, HEADS, VIEWS, KERNELS = 64, 2, 4, 3, 2
BATCH = 64
DATASET, NCLASSES, DIFFICULTY = "cifar10", 10, 0.0
N_TRAIN, N_TEST = 4000, 1000


def set_hard_config():
    """The 5M abcd_5m.log B config on synthetic-hard CIFAR-100."""
    global DIM, DEPTH, HEADS, VIEWS, KERNELS, DATASET, NCLASSES
    global DIFFICULTY, N_TRAIN, N_TEST
    DIM, DEPTH, HEADS, VIEWS, KERNELS = 224, 6, 4, 5, 3
    DATASET, NCLASSES, DIFFICULTY = "cifar100", 100, 0.85
    N_TRAIN, N_TEST = 8000, 2000


def make_data():
    from mop_tpu.data import synthetic_cifar

    tr_x, tr_y, te_x, te_y = synthetic_cifar(
        DATASET, N_TRAIN, N_TEST, seed=0, difficulty=DIFFICULTY)
    return tr_x, tr_y, te_x, te_y


def batch_indices(n, steps, batch, seed):
    rng = np.random.RandomState(seed)
    order = []
    while len(order) < steps * batch:
        order.extend(rng.permutation(n))
    idx = np.asarray(order[: steps * batch]).reshape(steps, batch)
    return idx


def norm(x_u8):
    return (x_u8.astype(np.float32) / 255.0 - MEAN) / STD


def train_torch(tr_x, tr_y, te_x, te_y, idx, steps, seed, lr):
    import torch

    sys.path.insert(0, REF)
    from mop.models import ViT_Baseline as TB, ViT_MoP as TM

    torch.manual_seed(seed)
    results = {}
    for name, model in [
        ("A", TB(dim=DIM, depth=DEPTH, heads=HEADS, n_classes=NCLASSES,
                 drop_path=0.0)),
        ("B", TM(dim=DIM, depth=DEPTH, heads=HEADS, n_classes=NCLASSES,
                 n_views=VIEWS, n_kernels=KERNELS, drop_path=0.0)),
    ]:
        opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=5e-2)
        sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=steps)
        model.train()
        for s in range(steps):
            xb = torch.from_numpy(norm(tr_x[idx[s]]))
            yb = torch.from_numpy(tr_y[idx[s]].astype(np.int64))
            opt.zero_grad(set_to_none=True)
            loss = torch.nn.functional.cross_entropy(model(xb), yb)
            loss.backward()
            opt.step()
            sch.step()
        model.eval()
        correct = 0
        with torch.no_grad():
            for i in range(0, len(te_x), 200):
                xb = torch.from_numpy(norm(te_x[i:i + 200]))
                pred = model(xb).argmax(1).numpy()
                correct += int((pred == te_y[i:i + 200]).sum())
        results[name] = correct / len(te_x)
        print(f"  torch {name}: {results[name]:.4f}", flush=True)
    return results


def train_jax(tr_x, tr_y, te_x, te_y, idx, steps, seed, lr):
    import jax
    import jax.numpy as jnp
    import optax

    from mop_tpu import config as mcfg
    from mop_tpu.models import ViT_Baseline, ViT_MoP

    mcfg.config.fused_attention = False  # exact reference math
    results = {}
    for name, model in [
        ("A", ViT_Baseline(dim=DIM, depth=DEPTH, heads=HEADS,
                           n_classes=NCLASSES, drop_path=0.0)),
        ("B", ViT_MoP(dim=DIM, depth=DEPTH, heads=HEADS, n_classes=NCLASSES,
                      n_views=VIEWS, n_kernels=KERNELS, drop_path=0.0)),
    ]:
        rng = jax.random.PRNGKey(seed)
        params = model.init(rng, jnp.zeros((BATCH, 3, 32, 32)))
        tx = optax.adamw(
            optax.cosine_decay_schedule(lr, steps), weight_decay=5e-2)
        opt = tx.init(params)

        @jax.jit
        def step_fn(params, opt, xb, yb):
            def lf(p):
                logits = model.apply(p, xb)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, yb).mean()
            loss, g = jax.value_and_grad(lf)(params)
            u, opt2 = tx.update(g, opt, params)
            return optax.apply_updates(params, u), opt2, loss

        for s in range(steps):
            xb = jnp.asarray(norm(tr_x[idx[s]]))
            yb = jnp.asarray(tr_y[idx[s]])
            params, opt, loss = step_fn(params, opt, xb, yb)

        @jax.jit
        def pred_fn(params, xb):
            return jnp.argmax(model.apply(params, xb), -1)

        correct = 0
        for i in range(0, len(te_x), 200):
            pred = np.asarray(pred_fn(params, jnp.asarray(norm(te_x[i:i + 200]))))
            correct += int((pred == te_y[i:i + 200]).sum())
        results[name] = correct / len(te_x)
        print(f"  jax   {name}: {results[name]:.4f}", flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--hard", action="store_true",
                    help="discriminative config: synthetic-hard CIFAR-100 "
                         "at the 5M abcd_5m.log B shape")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    if args.hard:
        set_hard_config()
    out = args.out or ("benchmarks/ab_hard/cross_framework.csv"
                       if args.hard else "results/accuracy_parity.csv")

    try:  # keep the torch side off any BLAS thread oversubscription
        import torch
        torch.set_num_threads(max(1, os.cpu_count() or 1))
    except Exception:
        pass

    tr_x, tr_y, te_x, te_y = make_data()
    rows = []
    for seed in args.seeds:
        print(f"seed {seed}", flush=True)
        idx = batch_indices(len(tr_x), args.steps, BATCH, seed=100 + seed)
        t = train_torch(tr_x, tr_y, te_x, te_y, idx, args.steps, seed, args.lr)
        j = train_jax(tr_x, tr_y, te_x, te_y, idx, args.steps, seed, args.lr)
        rows.append([seed, f"{t['A']:.4f}", f"{j['A']:.4f}",
                     f"{t['B']:.4f}", f"{j['B']:.4f}"])
        print(f"  seed {seed}: torch d(B-A)={t['B']-t['A']:+.4f}  "
              f"jax d(B-A)={j['B']-j['A']:+.4f}", flush=True)

    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("seed,torch_A,jax_A,torch_B,jax_B\n")
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")
    arr = np.asarray([[float(v) for v in r[1:]] for r in rows])
    d_torch = arr[:, 2] - arr[:, 0]   # per-seed torch B-A
    d_jax = arr[:, 3] - arr[:, 1]     # per-seed jax B-A
    print("\nmean torch_A={:.4f} jax_A={:.4f} torch_B={:.4f} jax_B={:.4f}".format(
        *arr.mean(0)))
    print(f"A gap: {abs(arr[:,0].mean()-arr[:,1].mean())*100:.2f}pp | "
          f"B gap: {abs(arr[:,2].mean()-arr[:,3].mean())*100:.2f}pp")
    print(f"delta(B-A): torch {d_torch.mean():+.4f}+-{d_torch.std():.4f} | "
          f"jax {d_jax.mean():+.4f}+-{d_jax.std():.4f}")

    if args.hard:
        md = os.path.splitext(out)[0] + ".md"
        sat = (arr > 0.995).mean()
        with open(md, "w") as f:
            f.write(
                "# Cross-framework A/B on synthetic-hard CIFAR-100 "
                "(torch reference vs mop-tpu)\n\n"
                f"5M abcd_5m.log B config (dim {DIM}, depth {DEPTH}, heads "
                f"{HEADS}, views {VIEWS}, kernels {KERNELS}), "
                f"difficulty {DIFFICULTY}, {args.steps} steps, batch "
                f"{BATCH}, AdamW lr {args.lr} cosine, NO augmentation, "
                f"IDENTICAL per-step batch composition in both frameworks "
                f"(same index schedule), {len(args.seeds)} seeds. The "
                f"compared quantity is the reference's own headline: the "
                f"A->B accuracy delta (ref abcd_5m.log). This replaces the "
                f"retired saturated accuracy_parity_300steps.csv (every "
                f"cell 1.0000) with an operating point where a real "
                f"accuracy bug in either framework WOULD separate the "
                f"columns.\n\n"
                "| seed | torch A | jax A | torch B | jax B | "
                "torch d(B-A) | jax d(B-A) |\n|---|---|---|---|---|---|---|\n")
            for i, r in enumerate(rows):
                f.write(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} | {r[4]} | "
                        f"{d_torch[i]:+.4f} | {d_jax[i]:+.4f} |\n")
            f.write(
                f"\n**delta(B-A): torch {d_torch.mean():+.4f} +- "
                f"{d_torch.std():.4f} vs jax {d_jax.mean():+.4f} +- "
                f"{d_jax.std():.4f}** — frameworks agree when the deltas "
                f"lie within each other's seed spread. Saturated cells "
                f"(>0.995): {sat*100:.0f}% (0% = fully discriminative).\n")
        print(f"saved {md}")
    print(f"saved {out}")


if __name__ == "__main__":
    main()
