"""Trajectory-equivalence parity: torch reference vs mop-tpu, lockstep.

The strongest accuracy evidence available in a zero-egress environment:
initialize BOTH frameworks from the SAME weights (torch init, transplanted
via ``mop_tpu.utils.torch_port``), train fp32 on IDENTICAL synthetic batches
with identical AdamW + cosine schedule, and compare per-step losses. If the
math is equivalent, the loss curves agree to float tolerance; any modeling
or optimizer mismatch diverges within a few steps.

Modes:
  --mode 5m     (default) A/B at the 5M benchmark configs, 50 steps fp32;
                writes benchmarks/trajectory_parity.csv
  --mode small  tiny configs, 30 steps; writes tests/golden/trajectory_{A,B}.npz
                (torch init weights + per-step torch losses) consumed by
                tests/test_trajectory_parity.py
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = os.environ.get("MOP_REFERENCE", "/root/reference")

MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32).reshape(1, 3, 1, 1)
STD = np.array([0.2470, 0.2435, 0.2616], np.float32).reshape(1, 3, 1, 1)

CONFIGS = {
    "5m": dict(dim=224, depth=6, heads=4, views=5, kernels=3,
               steps=50, batch=64),
    "small": dict(dim=64, depth=2, heads=4, views=3, kernels=2,
                  steps=30, batch=32),
}
LR, WD = 1e-3, 5e-2


def make_batches(steps, batch, seed=0):
    from mop_tpu.data import synthetic_cifar

    tr_x, tr_y, _, _ = synthetic_cifar("cifar10", steps * batch, 8, seed=seed)
    x = ((tr_x.astype(np.float32) / 255.0 - MEAN) / STD).reshape(
        steps, batch, 3, 32, 32)
    y = tr_y.reshape(steps, batch).astype(np.int64)
    return x, y


def torch_models(cfg, seed=0):
    import torch

    sys.path.insert(0, REF)
    from mop.models import ViT_Baseline as TA, ViT_MoP as TB

    torch.manual_seed(seed)
    a = TA(dim=cfg["dim"], depth=cfg["depth"], heads=cfg["heads"],
           n_classes=10, drop_path=0.0)
    b = TB(dim=cfg["dim"], depth=cfg["depth"], heads=cfg["heads"],
           n_classes=10, n_views=cfg["views"], n_kernels=cfg["kernels"],
           drop_path=0.0)
    return {"A": a, "B": b}


def train_torch(model, x, y):
    """Per-step fp32 losses. model.eval(): deterministic forward (drop_path=0,
    no dropout) — grads still flow; matches the jax side's train=False."""
    import torch

    model.eval()
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=x.shape[0])
    losses = []
    for s in range(x.shape[0]):
        xb = torch.from_numpy(x[s])
        yb = torch.from_numpy(y[s])
        opt.zero_grad(set_to_none=True)
        loss = torch.nn.functional.cross_entropy(model(xb), yb)
        loss.backward()
        opt.step()
        sch.step()
        losses.append(float(loss.item()))
    return np.asarray(losses, np.float64)


def jax_model(cfg, name):
    from mop_tpu.models import ViT_Baseline, ViT_MoP

    if name == "A":
        return ViT_Baseline(dim=cfg["dim"], depth=cfg["depth"],
                            heads=cfg["heads"], n_classes=10, drop_path=0.0)
    return ViT_MoP(dim=cfg["dim"], depth=cfg["depth"], heads=cfg["heads"],
                   n_classes=10, n_views=cfg["views"],
                   n_kernels=cfg["kernels"], drop_path=0.0)


def train_jax(model, torch_sd, x, y):
    import jax
    import jax.numpy as jnp
    import optax

    from mop_tpu import config as mcfg
    from mop_tpu.utils.torch_port import port_torch_state_dict

    mcfg.config.fused_attention = False  # exact composed math, fp32
    steps = x.shape[0]
    params = model.init(jax.random.PRNGKey(0), jnp.zeros(x.shape[1:]))
    params = port_torch_state_dict(torch_sd, params)
    tx = optax.adamw(optax.cosine_decay_schedule(LR, steps), weight_decay=WD)
    opt = tx.init(params)

    @jax.jit
    def step_fn(params, opt, xb, yb):
        def lf(p):
            logits = model.apply(p, xb, train=False)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
        loss, g = jax.value_and_grad(lf)(params)
        u, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt2, loss

    losses = []
    for s in range(steps):
        params, opt, loss = step_fn(params, opt, jnp.asarray(x[s]),
                                    jnp.asarray(y[s].astype(np.int32)))
        losses.append(float(loss))
    return np.asarray(losses, np.float64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("5m", "small"), default="5m")
    args = ap.parse_args()
    cfg = CONFIGS[args.mode]

    import jax

    jax.config.update("jax_platforms", "cpu")  # fp32 determinism; no TPU needed

    x, y = make_batches(cfg["steps"], cfg["batch"])
    tms = torch_models(cfg)

    if args.mode == "small":
        os.makedirs(os.path.join(REPO, "tests", "golden"), exist_ok=True)
        for name, tm in tms.items():
            # .copy(): numpy() views torch storage, which the in-place
            # optimizer updates would mutate before we save/transplant.
            sd = {k: v.detach().numpy().copy()
                  for k, v in tm.state_dict().items()}
            losses = train_torch(tm, x, y)
            out = {f"w__{k}": v for k, v in sd.items()}
            out["out__losses"] = losses
            path = os.path.join(REPO, "tests", "golden",
                                f"trajectory_{name}.npz")
            np.savez_compressed(path, **out)
            print(f"{name}: wrote {path} ({losses[0]:.4f} -> {losses[-1]:.4f})")
        return

    rows = []
    for name, tm in tms.items():
        # .copy(): numpy() views torch storage, which the in-place
        # optimizer updates would mutate before we save/transplant.
        sd = {k: v.detach().numpy().copy()
              for k, v in tm.state_dict().items()}
        print(f"[{name}] torch 50-step fp32 run...", flush=True)
        lt = train_torch(tm, x, y)
        print(f"[{name}] jax lockstep run...", flush=True)
        lj = train_jax(jax_model(cfg, name), sd, x, y)
        rel = np.abs(lt - lj) / np.maximum(np.abs(lt), 1e-9)
        for s in range(cfg["steps"]):
            rows.append((name, s, lt[s], lj[s], rel[s]))
        print(f"[{name}] max rel loss diff over {cfg['steps']} steps: "
              f"{rel.max():.2e} (final torch {lt[-1]:.4f} vs jax {lj[-1]:.4f})")

    path = os.path.join(REPO, "benchmarks", "trajectory_parity.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["model", "step", "loss_torch", "loss_jax", "rel_diff"])
        for r in rows:
            w.writerow([r[0], r[1], f"{r[2]:.6f}", f"{r[3]:.6f}", f"{r[4]:.2e}"])
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
