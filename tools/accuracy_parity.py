#!/usr/bin/env python
"""Accuracy-parity experiment: torch reference vs mop-tpu on identical data.

Trains ViT_Baseline (A) and ViT_MoP (B) in BOTH frameworks on the same
deterministic synthetic CIFAR-10 (identical batch composition per step, same
schedule/normalization, no augmentation) and compares final test accuracies.
BASELINE.json asks for reference-matching accuracy; with no real CIFAR in this
zero-egress environment, this controlled same-data comparison is the
verifiable equivalent. Writes results/accuracy_parity.csv.

Usage: python tools/accuracy_parity.py [--steps 300] [--seeds 0 1]
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


def make_data():
    from mop_tpu.data import synthetic_cifar

    tr_x, tr_y, te_x, te_y = synthetic_cifar("cifar10", 4000, 1000, seed=0)
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
        ("A", TB(dim=DIM, depth=DEPTH, heads=HEADS, n_classes=10, drop_path=0.0)),
        ("B", TM(dim=DIM, depth=DEPTH, heads=HEADS, n_classes=10,
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
        ("A", ViT_Baseline(dim=DIM, depth=DEPTH, heads=HEADS, n_classes=10,
                           drop_path=0.0)),
        ("B", ViT_MoP(dim=DIM, depth=DEPTH, heads=HEADS, n_classes=10,
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
    ap.add_argument("--out", type=str, default="results/accuracy_parity.csv")
    args = ap.parse_args()

    tr_x, tr_y, te_x, te_y = make_data()
    rows = []
    for seed in args.seeds:
        print(f"seed {seed}", flush=True)
        idx = batch_indices(len(tr_x), args.steps, BATCH, seed=100 + seed)
        t = train_torch(tr_x, tr_y, te_x, te_y, idx, args.steps, seed, args.lr)
        j = train_jax(tr_x, tr_y, te_x, te_y, idx, args.steps, seed, args.lr)
        rows.append([seed, f"{t['A']:.4f}", f"{j['A']:.4f}",
                     f"{t['B']:.4f}", f"{j['B']:.4f}"])

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("seed,torch_A,jax_A,torch_B,jax_B\n")
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")
    arr = np.asarray([[float(v) for v in r[1:]] for r in rows])
    print("\nmean torch_A={:.4f} jax_A={:.4f} torch_B={:.4f} jax_B={:.4f}".format(
        *arr.mean(0)))
    print(f"A gap: {abs(arr[:,0].mean()-arr[:,1].mean())*100:.2f}pp | "
          f"B gap: {abs(arr[:,2].mean()-arr[:,3].mean())*100:.2f}pp")
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
