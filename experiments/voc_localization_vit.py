#!/usr/bin/env python
"""VOC07/12 single-object localization with a ViT backbone (TPU-native).

Flag/output parity with reference ``experiments/voc_localization_vit.py``:
modes A (plain), B (MoP token gate), E (UnifiedMSA edgewise blocks);
SmoothL1 box loss; IoU/L1 eval. Synthetic rectangle dataset fallback when
VOCdevkit is absent (zero-egress environment).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from experiments import common as C
from mop_tpu.utils import jitted_init
from mop_tpu.data.voc import has_real_voc, load_voc_boxes, synthetic_voc
from mop_tpu.models.vit_localizer import ViTLocalizer, bbox_iou, smooth_l1
from mop_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize, to_float
from mop_tpu.parallel import make_mesh, replicate, replicated, batch_sharding


def main():
    ap = argparse.ArgumentParser(
        description="VOC07/12 single-object localization with ViT backbone")
    ap.add_argument("--data_root", type=str, default="./data")
    ap.add_argument("--year", type=str, default="2007", choices=["2007", "2012"])
    ap.add_argument("--download", action="store_true",
                    help="(no-op in zero-egress envs; place VOCdevkit under data_root)")
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--patch", type=int, default=16)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--mlp_ratio", type=float, default=4.0)
    ap.add_argument("--drop_path", type=float, default=0.1)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup_frac", type=float, default=0.1)
    ap.add_argument("--weight_decay", type=float, default=5e-2)
    ap.add_argument("--eval_every", type=int, default=1)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--out", type=str, default="results/voc_localization")
    ap.add_argument("--model", type=str, default="A", choices=["A", "B", "E"],
                    help="A=baseline, B=MoP gate, E=Edgewise attention")
    ap.add_argument("--mop_views", type=int, default=5)
    ap.add_argument("--mop_kernels", type=int, default=3)
    ap.add_argument("--ew_views", type=int, default=4)
    ap.add_argument("--ew_use_k3", action="store_true")
    ap.add_argument("--ew_share_qkv", action="store_true")
    ap.add_argument("--ew_gate_mode", type=str, default="lowrank",
                    choices=["dense", "lowrank"])
    ap.add_argument("--ew_gate_rank", type=int, default=4)
    ap.add_argument("--ew_gate_init", type=str, default="neutral",
                    choices=["neutral", "and", "or", "not", "nor", "xor",
                             "chain", "mix5"])
    ap.add_argument("--ew_use_lens_bank_qk", action="store_true")
    ap.add_argument("--ew_lens_qk_dilations", type=int, nargs="+", default=None)
    ap.add_argument("--ew_lens_qk_causal", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    print(f"Device: {C.get_device_str()}")
    mesh = make_mesh()

    n_train, n_val = (256, 64) if args.tiny else (2000, 500)
    if not args.synthetic and has_real_voc(args.data_root, args.year):
        tx_img, tx_box = load_voc_boxes(args.data_root, args.year, "train",
                                        args.img_size)
        vx_img, vx_box = load_voc_boxes(args.data_root, args.year, "val",
                                        args.img_size)
        print(f"Loaded VOC{args.year}: {len(tx_img)} train / {len(vx_img)} val")
    else:
        tx_img, tx_box = synthetic_voc(n_train, args.img_size, seed=0)
        vx_img, vx_box = synthetic_voc(n_val, args.img_size, seed=1)
        print(f"Synthetic rectangles: {n_train} train / {n_val} val")

    attn_kwargs = None
    if args.model == "E":
        attn_kwargs = dict(
            n_views=args.ew_views, use_k3=args.ew_use_k3,
            share_qkv=args.ew_share_qkv, gate_mode=str(args.ew_gate_mode),
            gate_rank=int(args.ew_gate_rank), gate_init=str(args.ew_gate_init),
        )
    model = ViTLocalizer(
        dim=args.dim, depth=args.depth, heads=args.heads,
        mlp_ratio=args.mlp_ratio, drop_path=args.drop_path,
        patch=args.patch, img_size=args.img_size,
        attn_mode=args.model, attn_kwargs=attn_kwargs,
        mop_views=args.mop_views, mop_kernels=args.mop_kernels,
    )

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 3, args.img_size, args.img_size))
    params = jitted_init(model, {"params": rng, "dropout": rng}, x0, train=True)
    n_batches = max(1, len(tx_img) // args.batch)
    total_steps = args.epochs * n_batches
    tx = C.make_opt(args.lr, total_steps, args.warmup_frac, args.weight_decay)
    opt_state = tx.init(params)
    rep, bsh = replicated(mesh), batch_sharding(mesh)

    def prep(x_u8):
        return normalize(to_float(x_u8), IMAGENET_MEAN, IMAGENET_STD)

    def loss_fn(p, xb, yb, key):
        pred = model.apply(p, prep(xb), train=True, rngs={"dropout": key})
        return jnp.mean(smooth_l1(pred, yb))

    @jax.jit
    def train_step(p, o, xb, yb, key):
        loss, g = jax.value_and_grad(loss_fn)(p, xb, yb, key)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    @jax.jit
    def eval_step(p, xb, yb):
        pred = model.apply(p, prep(xb), train=False)
        return jnp.mean(bbox_iou(pred, yb)), jnp.mean(jnp.abs(pred - yb))

    def evaluate(p):
        ious, l1s = [], []
        for i in range(0, len(vx_img) - args.batch + 1, args.batch):
            iou, l1 = eval_step(p, vx_img[i:i + args.batch], vx_box[i:i + args.batch])
            ious.append(float(iou))
            l1s.append(float(l1))
        return float(np.mean(ious)), float(np.mean(l1s))

    order_rng = np.random.RandomState(0)
    with mesh:
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        step = 0
        for epoch in range(1, args.epochs + 1):
            order = order_rng.permutation(len(tx_img))
            for i in range(n_batches):
                idx = order[i * args.batch:(i + 1) * args.batch]
                if len(idx) < args.batch:
                    continue
                key = jax.random.fold_in(rng, step)
                params, opt_state, loss = train_step(
                    params, opt_state, tx_img[idx], tx_box[idx], key)
                step += 1
            if epoch % max(args.eval_every, 1) == 0:
                iou, l1 = evaluate(params)
                print(f"epoch {epoch}/{args.epochs} | loss={float(loss):.4f} "
                      f"| val IoU={iou:.4f} L1={l1:.4f}")

        iou, l1 = evaluate(params)
    csv_path = os.path.join(args.out, f"voc_{args.model}_results.csv")
    C.save_csv(csv_path, ["model", "val_iou", "val_l1"],
               [[args.model, f"{iou:.4f}", f"{l1:.4f}"]])
    print(f"\nFinal: IoU={iou:.4f} L1={l1:.4f}")
    print(f"Results saved to: {csv_path}")


if __name__ == "__main__":
    main()
