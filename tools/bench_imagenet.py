"""ImageNet-shape throughput: ViT-S-class models at 224x224 (the MXU-bound
regime).

The CIFAR headline model (dim 224, 64 tokens) is HBM-bandwidth-bound —
tools/bench_ablation.py shows ~74% of its step is dim-linear memory traffic,
capping MFU near 26%. At ImageNet shapes (196 tokens, dim 384+) the matmuls
dominate and the same train-step code should reach several times higher MFU.
This tool measures it: full train step with the reference's regularization
suite (RandAug/Mixup/CutMix/label smoothing), min-of-3, MFU from XLA cost
analysis.

Writes benchmarks/imagenet_throughput.md and prints one JSON line.

Usage: python tools/bench_imagenet.py [--dim 384 --depth 12 --batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--patch", type=int, default=16)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n_classes", type=int, default=1000)
    ap.add_argument("--model", choices=("A", "B"), default="B")
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mop_tpu.models import ViT_Baseline, ViT_MoP
    from mop_tpu.parallel import (make_imagenet_train_step, make_mesh,
                                  replicate, shard_batch)

    mesh = make_mesh()
    n_chips = len(list(mesh.devices.flat))
    b = args.batch * n_chips
    kw = dict(dim=args.dim, depth=args.depth, heads=args.heads,
              n_classes=args.n_classes, patch=args.patch, img_size=args.img)
    model = (ViT_MoP(**kw) if args.model == "B" else ViT_Baseline(**kw))
    rng = jax.random.PRNGKey(0)
    x = np.random.RandomState(0).randint(
        0, 256, (b, 3, args.img, args.img), dtype=np.uint8)
    y = np.random.RandomState(1).randint(
        0, args.n_classes, (b,)).astype(np.int32)
    from mop_tpu.utils import jitted_init
    params = jitted_init(model, {"params": rng, "dropout": rng},
                         jnp.zeros((2, 3, args.img, args.img)), train=True)
    n_params = sum(v.size for v in jax.tree_util.tree_leaves(params))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    tx = optax.adamw(1e-3, weight_decay=0.05)

    with mesh:
        p = replicate(params, mesh)
        o = replicate(tx.init(params), mesh)
        xb, yb = shard_batch((x, y), mesh)
        step = make_imagenet_train_step(
            model, tx, mesh, mean, std, n_classes=args.n_classes,
            use_randaug=True)
        for i in range(3):
            p, o, m = step(p, o, xb, yb, jax.random.fold_in(rng, i))
        float(m["loss"])
        times = []
        for w in range(args.windows):
            t0 = time.perf_counter()
            for i in range(args.steps):
                p, o, m = step(p, o, xb, yb,
                               jax.random.fold_in(rng, 100 + w * 50 + i))
            float(m["loss"])
            times.append((time.perf_counter() - t0) / args.steps)
        best = min(times)

        flops = None
        try:
            comp = step.lower(p, o, xb, yb, rng).compile()
            ca = comp.cost_analysis()
            if ca and ca.get("flops"):
                flops = float(ca["flops"])
        except Exception as e:  # noqa: BLE001
            log(f"cost_analysis unavailable: {e}")

    from mop_tpu.utils.profiling import chip_peak_bf16_flops

    imgs = b / best / n_chips
    peak = chip_peak_bf16_flops()
    mfu = flops / best / (peak * n_chips) if (flops and peak) else None
    log(f"model {args.model} dim{args.dim} d{args.depth} p{args.patch} "
        f"{args.img}px ({n_params:,} params): {best * 1e3:.1f} ms/step "
        f"(all {['%.1f' % (t * 1e3) for t in times]}) -> {imgs:,.0f} "
        f"img/s/chip" + (f", MFU {mfu * 100:.1f}%" if mfu else ""))
    print(json.dumps({
        "metric": "imagenet_vit_images_per_sec_per_chip",
        "value": round(imgs, 1),
        "model": args.model, "params": n_params, "batch": b,
        "ms_per_step": round(best * 1e3, 2),
        "mfu": round(mfu, 4) if mfu else None,
    }))

    md = os.path.join(REPO, "benchmarks", "imagenet_throughput.md")
    header_needed = not os.path.exists(md)
    with open(md, "a") as f:
        if header_needed:
            f.write(
                "# ImageNet-shape train-step throughput (224x224)\n\n"
                "Full train step incl. the reference's regularization suite "
                "(RandAug, RandomErasing, Mixup/CutMix, label smoothing, "
                "grad clip), bf16, min-of-3 windows, host-transfer barrier. "
                "MFU from XLA cost analysis vs chip peak bf16.\n\n"
                "| model | params | batch | ms/step | img/s/chip | MFU |\n"
                "|---|---|---|---|---|---|\n")
        f.write(f"| ViT-{args.model} dim{args.dim}/d{args.depth}"
                f"/p{args.patch} | {n_params:,} | {b} | "
                f"{best * 1e3:.1f} | {imgs:,.0f} | "
                f"{mfu * 100:.1f}% |\n" if mfu else
                f"| ViT-{args.model} dim{args.dim}/d{args.depth}"
                f"/p{args.patch} | {n_params:,} | {b} | "
                f"{best * 1e3:.1f} | {imgs:,.0f} | n/a |\n")
    log(f"wrote {md}")


if __name__ == "__main__":
    main()
