"""Measure the E-mode (edgewise-lowrank) TRAIN step: fused backward kernel
vs XLA autodiff over the composed path. Min-of-3 timed windows, scanned
device-side loop, host-transfer barrier (block_until_ready is a no-op on the
axon backend).

Writes benchmarks/edgewise_train_kernel.md and prints a JSON summary. The
result sets the default of MOP_TPU_FUSED_EDGEWISE_TRAIN (mop_tpu/config.py).

Usage: python tools/bench_edgewise_train.py [--target 5000000] [--batch 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_step_and_data(model, batch, K, mesh):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mop_tpu.ops.preprocess import CIFAR100_MEAN, CIFAR100_STD
    from mop_tpu.parallel import (
        make_scanned_classifier_train_step,
        replicate,
        shard_batch,
    )

    rng = jax.random.PRNGKey(0)
    xk = np.random.RandomState(0).randint(
        0, 256, (K, batch, 3, 32, 32), dtype=np.uint8)
    yk = np.random.RandomState(1).randint(0, 100, (K, batch)).astype(np.int32)
    from mop_tpu.utils import jitted_init
    params = jitted_init(
        model, {"params": rng, "dropout": rng}, jnp.zeros((batch, 3, 32, 32)),
        train=True)
    tx = optax.adamw(3e-3, weight_decay=0.05)
    opt_state = tx.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    xkb, ykb = shard_batch((xk, yk), mesh)
    step = make_scanned_classifier_train_step(
        model, tx, mesh, CIFAR100_MEAN, CIFAR100_STD, unroll_steps=K,
        augment=True)
    return step, params, opt_state, xkb, ykb, rng


def time_variant(model, batch, K, mesh, n_windows=3, steps_per_window=50):
    """Returns min-of-n window ms/step. A fresh step closure per variant so
    the config flag (read at trace time) is honored."""
    import jax

    step, params, opt, xkb, ykb, rng = build_step_and_data(model, batch, K, mesh)
    with mesh:
        # >=3 warmups: donated-buffer layouts trigger a recompile on call 2.
        for i in range(3):
            params, opt, m = step(params, opt, xkb, ykb,
                                  jax.random.fold_in(rng, i))
        float(m["loss"][-1])  # barrier
        times = []
        n_super = max(1, steps_per_window // K)
        for w in range(n_windows):
            t0 = time.perf_counter()
            for i in range(n_super):
                params, opt, m = step(params, opt, xkb, ykb,
                                      jax.random.fold_in(rng, 100 + w * 50 + i))
            float(m["loss"][-1])  # barrier
            dt = time.perf_counter() - t0
            times.append(dt / (n_super * K) * 1e3)
    return min(times), times, float(m["loss"][-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=int, default=5_000_000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--scan", type=int, default=10)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--gate_init", type=str, default="mix5")
    ap.add_argument("--gate_mode", type=str, default="lowrank",
                    choices=("lowrank", "dense"))
    ap.add_argument("--use_k3", action="store_true")
    ap.add_argument("--n_views", type=int, default=2)
    args = ap.parse_args()

    import jax

    from experiments.common import find_config_for_target
    from mop_tpu import config as mcfg
    from mop_tpu.models import ViTEdgewise
    from mop_tpu.parallel import make_mesh

    xkwargs = dict(n_views=args.n_views, share_qkv=True,
                   gate_mode=args.gate_mode, gate_rank=4,
                   gate_init=args.gate_init, beta_not=0.5,
                   use_k3=args.use_k3)
    cfg, n_params = find_config_for_target(
        ViTEdgewise, n_classes=100, target_params=args.target,
        dims=(128, 160, 192, 224, 256), depths=(6, 8), heads_list=(4,),
        extra_kwargs=xkwargs)
    print(f"config: {cfg} params={n_params:,} views={args.n_views} "
          f"gate={args.gate_mode}:{args.gate_init}", file=sys.stderr)
    model = ViTEdgewise(n_classes=100, **cfg, **xkwargs)
    mesh = make_mesh()
    n_chips = len(list(mesh.devices.flat))
    batch = args.batch * n_chips

    results = {}
    for name, flag in (("xla", False), ("fused", True)):
        mcfg.config.fused_edgewise_train = flag
        mcfg.config.fused_attention = flag or mcfg.config.fused_attention
        best, all_t, loss = time_variant(
            model, batch, args.scan, mesh, n_windows=args.windows)
        results[name] = {"ms_per_step": round(best, 3),
                         "all_windows_ms": [round(t, 3) for t in all_t],
                         "loss": round(loss, 4)}
        print(f"{name}: min-of-{args.windows} {best:.2f} ms/step "
              f"(all {['%.2f' % t for t in all_t]}), loss {loss:.4f}",
              file=sys.stderr)

    speedup = results["xla"]["ms_per_step"] / results["fused"]["ms_per_step"]
    summary = {
        "config": cfg, "params": n_params, "batch": batch,
        "gate": f"{args.gate_mode}:{args.gate_init}", "n_views": args.n_views,
        "platform": jax.devices()[0].platform,
        "xla_ms": results["xla"]["ms_per_step"],
        "fused_ms": results["fused"]["ms_per_step"],
        "fused_speedup": round(speedup, 3),
        "detail": results,
    }
    print(json.dumps(summary))

    suffix = "" if args.gate_mode == "lowrank" else f"_{args.gate_mode}"
    md = os.path.join(REPO, "benchmarks", f"edgewise_train_kernel{suffix}.md")
    with open(md, "w") as f:
        f.write(
            f"# Edgewise-{args.gate_mode} fused TRAIN kernel measurement\n\n"
            f"Model: ViTEdgewise {cfg} ({n_params:,} params), "
            f"views={args.n_views}, gate={args.gate_mode}:{args.gate_init}, "
            f"batch={batch}, scan={args.scan}, "
            f"platform={jax.devices()[0].platform}.\n\n"
            "Full train step (on-device augment, bf16 fwd/bwd, AdamW), "
            f"min-of-{args.windows} windows, host-transfer barrier.\n\n"
            "| path | ms/step (min) | windows |\n|---|---|---|\n"
            f"| XLA autodiff | {results['xla']['ms_per_step']} | "
            f"{results['xla']['all_windows_ms']} |\n"
            f"| fused fwd + fused bwd (in-kernel VJP) | "
            f"{results['fused']['ms_per_step']} | "
            f"{results['fused']['all_windows_ms']} |\n\n"
            f"**Fused speedup: {speedup:.2f}x.** "
            "This measurement sets the MOP_TPU_FUSED_EDGEWISE_TRAIN default "
            "(mop_tpu/config.py).\n")
    print(f"wrote {md}", file=sys.stderr)


if __name__ == "__main__":
    main()
