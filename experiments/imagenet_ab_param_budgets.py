#!/usr/bin/env python
"""ImageNet A/B/E parameter-budget experiment (TPU-native).

Flag/output parity with reference ``experiments/imagenet_ab_param_budgets.py``:
ImageFolder data (``$IMAGENET_ROOT``) with val->val/test split (test_frac 0.2),
RandAugment/RandomErasing/Mixup/CutMix (``--mix_prob`` arbitration), label
smoothing, grad clip, EMA shadow params updated per step and used for eval,
large-budget LR switch, ``--ew_variants``. CSV ``imagenet_ab_target_{N}*.csv``.

Synthetic ImageFolder fallback for zero-egress environments (``--synthetic``).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from experiments import common as C
from mop_tpu.utils import jitted_init
from mop_tpu.data.cifar import BatchIterator, eval_batches
from mop_tpu.data.imagenet import (
    has_imagefolder,
    load_imagefolder,
    synthetic_imagenet,
    val_test_split,
)
from mop_tpu.models import ViT_Baseline, ViT_MoP, ViTEdgewise
from mop_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD
from mop_tpu.parallel import (
    make_classifier_eval_step,
    make_imagenet_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from mop_tpu.training.utils import ema_update

IMAGENET_DIMS = (192, 224, 256, 320, 384, 448, 512, 640, 768, 1024, 1280)
IMAGENET_DEPTHS = (8, 10, 12, 16, 24, 32)
IMAGENET_HEADS = (3, 4, 6, 8, 12, 16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", type=str,
                    default=os.environ.get("IMAGENET_ROOT", "./data/imagenet"))
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--steps", type=int, default=10_000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--lr_large", type=float, default=1e-3)
    ap.add_argument("--large_threshold", type=int, default=100_000_000)
    ap.add_argument("--warmup_frac", type=float, default=0.1)
    ap.add_argument("--weight_decay", type=float, default=5e-2)
    ap.add_argument("--eval_every", type=int, default=1000)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--targets", type=int, nargs="+",
                    default=[50_000_000, 300_000_000])
    ap.add_argument("--models", type=str, nargs="+", choices=["A", "B", "E"],
                    default=["A", "B"])
    ap.add_argument("--mop_views", type=int, default=5)
    ap.add_argument("--mop_kernels", type=int, default=3)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--patch", type=int, default=16)
    ap.add_argument("--drop_path", type=float, default=0.4)
    ap.add_argument("--ew_beta_not", type=float, default=0.5)
    ap.add_argument("--ew_use_k3", action="store_true")
    ap.add_argument("--ew_views", type=int, default=5)
    ap.add_argument("--ew_share_qkv", action="store_true")
    ap.add_argument("--ew_mlp_ratio", type=float, default=4.0)
    ap.add_argument("--ew_variants", type=str, nargs="+", default=None)
    ap.add_argument("--ew_gate_mode", type=str, default="dense",
                    choices=["dense", "lowrank"])
    ap.add_argument("--ew_gate_rank", type=int, default=4)
    ap.add_argument("--ew_gate_init", type=str, default="neutral",
                    choices=["neutral", "and", "or", "not", "nor", "xor", "chain"])
    ap.add_argument("--label_smoothing", type=float, default=0.1)
    ap.add_argument("--use_randaug", action="store_true")
    ap.add_argument("--randaug_n", type=int, default=2)
    ap.add_argument("--randaug_m", type=int, default=9)
    ap.add_argument("--random_erasing", type=float, default=0.25)
    ap.add_argument("--mixup_alpha", type=float, default=0.8)
    ap.add_argument("--cutmix_alpha", type=float, default=1.0)
    ap.add_argument("--mix_prob", type=float, default=0.5)
    ap.add_argument("--grad_clip", type=float, default=1.0)
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--ema_decay", type=float, default=0.9999)
    ap.add_argument("--out", type=str, default="results/imagenet_ab_param_budgets")
    ap.add_argument("--ckpt_every", type=int, default=0,
                    help="save per-model checkpoints every N steps (0 = off)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoints under --out")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    print(f"Device: {C.get_device_str()}")
    mesh = make_mesh()

    if not args.synthetic and has_imagefolder(args.data_root, "train"):
        tr_x, tr_y, classes = load_imagefolder(args.data_root, "train", args.img_size,
                                               limit_per_class=50 if args.tiny else None)
        va_all_x, va_all_y, _ = load_imagefolder(args.data_root, "val", args.img_size,
                                                 limit_per_class=10 if args.tiny else None)
        n_classes = len(classes)
        va_x, va_y, te_x, te_y = val_test_split(va_all_x, va_all_y, test_frac=0.2)
    else:
        n_classes = 100
        n_tr, n_te = (512, 256) if args.tiny else (4000, 1000)
        tr_x, tr_y, va_all_x, va_all_y = synthetic_imagenet(
            n_tr, n_te, n_classes, args.img_size)
        va_x, va_y, te_x, te_y = val_test_split(va_all_x, va_all_y, test_frac=0.2)
        print(f"Synthetic ImageFolder: {n_tr} train / {len(va_x)} val / {len(te_x)} test")

    def val_batches():
        return eval_batches(va_x, va_y, args.batch)

    def test_batches():
        return eval_batches(te_x, te_y, args.batch)

    def estimate_kwargs():
        return dict(img_size=args.img_size)

    for target in args.targets:
        print(f"\nTarget parameters: {int(target):,}")
        lr_current = args.lr if int(target) < int(args.large_threshold) else args.lr_large
        base_extra = {"patch": args.patch, "img_size": args.img_size}
        base_cfg, base_p = C.find_config_for_target(
            ViT_Baseline, n_classes=n_classes, target_params=int(target),
            dims=IMAGENET_DIMS, depths=IMAGENET_DEPTHS, heads_list=IMAGENET_HEADS,
            extra_kwargs=base_extra, img_size=args.img_size,
        )
        cfgs: Dict[str, Tuple[Dict[str, int], int]] = {}
        if "B" in args.models:
            cfgs["B"] = C.find_model_config_match_baseline(
                ViT_MoP, n_classes=n_classes, target_params=int(target),
                baseline_cfg=base_cfg, baseline_params=base_p, max_ratio_diff=0.01,
                depths_choices=IMAGENET_DEPTHS, heads_choices=IMAGENET_HEADS,
                extra_kwargs={**base_extra, "n_views": args.mop_views,
                              "n_kernels": args.mop_kernels},
                img_size=args.img_size,
            )[:2]
        if "E" in args.models:
            ew_extra = {
                **base_extra, "beta_not": args.ew_beta_not,
                "use_k3": args.ew_use_k3, "n_views": args.ew_views,
                "share_qkv": args.ew_share_qkv, "mlp_ratio": args.ew_mlp_ratio,
                "gate_mode": args.ew_gate_mode, "gate_rank": args.ew_gate_rank,
                "gate_init": args.ew_gate_init,
            }
            # ViTEdgewise takes num_tokens, not img_size/patch
            ew_extra.pop("img_size"); ew_extra.pop("patch")
            ew_extra["patch"] = args.patch
            ew_extra["num_tokens"] = (args.img_size // args.patch) ** 2
            cfgs["E"] = C.find_model_config_match_baseline(
                ViTEdgewise, n_classes=n_classes, target_params=int(target),
                baseline_cfg=base_cfg, baseline_params=base_p, max_ratio_diff=0.01,
                depths_choices=IMAGENET_DEPTHS, heads_choices=IMAGENET_HEADS,
                extra_kwargs=ew_extra, img_size=args.img_size,
            )[:2]

        print(f"Baseline cfg: {base_cfg} | params={base_p:,}")
        for k in ("B", "E"):
            if k in cfgs:
                print(f"{k} cfg: {cfgs[k][0]} | params={cfgs[k][1]:,}")

        model_keys = [k for k in ("A", "B") if k in args.models or k == "A"]
        e_variant_specs: Optional[List[Tuple[str, str]]] = None
        if "E" in args.models:
            if args.ew_variants:
                e_variant_specs = []
                for spec in args.ew_variants:
                    mode, init = spec.split(":", 1)
                    model_keys.append(f"E_{mode}_{init}")
                    e_variant_specs.append((mode, init))
            else:
                model_keys.append("E")

        def make_model(key):
            if key == "A":
                return ViT_Baseline(n_classes=n_classes, **base_cfg, **base_extra,
                                    drop_path=args.drop_path)
            if key == "B":
                return ViT_MoP(n_classes=n_classes, **cfgs["B"][0], **base_extra,
                               drop_path=args.drop_path,
                               n_views=args.mop_views, n_kernels=args.mop_kernels)
            mode, init = args.ew_gate_mode, args.ew_gate_init
            if key.startswith("E_"):
                _, mode, init = key.split("_", 2)
            return ViTEdgewise(
                n_classes=n_classes, **cfgs["E"][0],
                patch=args.patch, num_tokens=(args.img_size // args.patch) ** 2,
                drop_path=args.drop_path, beta_not=args.ew_beta_not,
                use_k3=args.ew_use_k3, n_views=args.ew_views,
                share_qkv=args.ew_share_qkv, mlp_ratio=args.ew_mlp_ratio,
                gate_mode=mode, gate_rank=args.ew_gate_rank, gate_init=init,
            )

        accs: Dict[str, List[float]] = {k: [] for k in model_keys}
        params_by_key = {}
        ema_by_key = {}

        for s in args.seeds:
            print(f"\nSeed {s}")
            C.set_seed(s)
            rng = jax.random.PRNGKey(s)
            steps_map, eval_map = {}, {}
            for key in model_keys:
                model = make_model(key)
                x0 = jnp.zeros((2, 3, args.img_size, args.img_size))
                p = jitted_init(model, {"params": rng, "dropout": rng}, x0, train=True)
                tx = C.make_opt(lr_current, args.steps, args.warmup_frac,
                                args.weight_decay)
                params_by_key[key] = (replicate(p, mesh), replicate(tx.init(p), mesh))
                if args.ema:
                    # Independent copy: the train step donates its param buffers.
                    ema_by_key[key] = jax.tree_util.tree_map(
                        jnp.copy, params_by_key[key][0])
                steps_map[key] = make_imagenet_train_step(
                    model, tx, mesh, IMAGENET_MEAN, IMAGENET_STD, n_classes,
                    label_smoothing=args.label_smoothing,
                    use_randaug=args.use_randaug, randaug_n=args.randaug_n,
                    randaug_m=args.randaug_m, random_erasing=args.random_erasing,
                    mixup_alpha=args.mixup_alpha, cutmix_alpha=args.cutmix_alpha,
                    mix_prob=args.mix_prob, grad_clip=args.grad_clip,
                )
                eval_map[key] = make_classifier_eval_step(
                    model, mesh, IMAGENET_MEAN, IMAGENET_STD)

            # Checkpoint/resume for long ImageNet runs (SURVEY §5.3-5.4: the
            # reference's helpers exist but no script calls them; a crash at
            # step 9k of 10k loses everything there).
            from mop_tpu.training.utils import load_checkpoint, save_checkpoint

            def _ckpt_path(key, step_i):
                return os.path.join(
                    args.out, f"ckpt_s{s}_{key}_step{step_i}.pkl")

            start_step = 1
            if args.resume:
                import glob as _glob

                steps_found = []
                for key in model_keys:
                    pat = os.path.join(args.out, f"ckpt_s{s}_{key}_step*.pkl")
                    found = [int(f.rsplit("step", 1)[1].split(".")[0])
                             for f in _glob.glob(pat)]
                    steps_found.append(max(found) if found else 0)
                common = min(steps_found) if steps_found else 0
                if common > 0:
                    for key in model_keys:
                        payload = load_checkpoint(_ckpt_path(key, common))
                        params_by_key[key] = (
                            replicate(payload["params"], mesh),
                            replicate(payload["opt_state"], mesh))
                        if args.ema and payload.get("extra") is not None:
                            ema_by_key[key] = replicate(
                                payload["extra"], mesh)
                    start_step = common + 1
                    print(f"resumed seed {s} from step {common}")

            it = BatchIterator(tr_x, tr_y, args.batch, seed=s)
            with mesh:
                for step_i in range(start_step, args.steps + 1):
                    xb, yb = next(it)
                    xb, yb = shard_batch((xb, yb), mesh)
                    for key in model_keys:
                        p, o = params_by_key[key]
                        p, o, m = steps_map[key](
                            p, o, xb, yb, jax.random.fold_in(rng, step_i))
                        params_by_key[key] = (p, o)
                        if args.ema:
                            ema_by_key[key] = ema_update(ema_by_key[key], p,
                                                         args.ema_decay)
                    if args.ckpt_every and step_i % args.ckpt_every == 0:
                        for key in model_keys:
                            pck, ock = params_by_key[key]
                            save_checkpoint(
                                _ckpt_path(key, step_i),
                                jax.tree_util.tree_map(np.asarray, pck),
                                opt_state=jax.tree_util.tree_map(
                                    np.asarray, ock),
                                epoch=step_i,
                                extra=jax.tree_util.tree_map(
                                    np.asarray, ema_by_key[key])
                                if args.ema else None)
                    if step_i % max(args.eval_every, 1) == 0 or step_i == 1:
                        report = []
                        for key in model_keys:
                            pe = ema_by_key[key] if args.ema else params_by_key[key][0]
                            correct = total = 0.0
                            for vxb, vyb, vmb in val_batches():
                                c, t = eval_map[key](pe, *shard_batch(
                                    (vxb, vyb, vmb), mesh))
                                correct += float(c)
                                total += float(t)
                            report.append((key, correct / max(total, 1)))
                        print(f"step {step_i} | " + " ".join(
                            f"A{k}={a:.3f}" for k, a in report))

                for key in model_keys:
                    pe = ema_by_key[key] if args.ema else params_by_key[key][0]
                    correct = total = 0.0
                    for vxb, vyb, vmb in val_batches():
                        c, t = eval_map[key](pe, *shard_batch((vxb, vyb, vmb), mesh))
                        correct += float(c)
                        total += float(t)
                    accs[key].append(correct / max(total, 1))
            print("seed", s, " ".join(f"{k}={accs[k][-1]:.4f}" for k in accs))

        # Test eval (last seed params, EMA if enabled)
        test_report = []
        with mesh:
            for key in model_keys:
                pe = ema_by_key[key] if args.ema else params_by_key[key][0]
                correct = total = 0.0
                for txb, tyb, tmb in test_batches():
                    c, t = eval_map[key](pe, *shard_batch((txb, tyb, tmb), mesh))
                    correct += float(c)
                    total += float(t)
                test_report.append((key, correct / max(total, 1)))

        C.save_csv(
            os.path.join(args.out, f"imagenet_ab_target_{int(target)}.csv"),
            ["seed"] + [f"acc_{k}" for k in accs],
            [[s] + [f"{accs[k][i]:.4f}" for k in accs]
             for i, s in enumerate(args.seeds)],
        )
        C.save_csv(
            os.path.join(args.out, f"imagenet_ab_target_{int(target)}_val_summary.csv"),
            ["model", "mean_val", "std_val"],
            [[k, f"{float(np.mean(v)):.6f}", f"{float(np.std(v)):.6f}"]
             for k, v in accs.items()],
        )
        C.save_csv(
            os.path.join(args.out, f"imagenet_ab_target_{int(target)}_test.csv"),
            ["model", "test_acc"],
            [[k, f"{a:.6f}"] for k, a in test_report],
        )
        print("\n" + " ".join(f"{k}={float(np.mean(v)):.4f}±{float(np.std(v)):.4f}"
                              for k, v in accs.items()))
        print(f"Results saved to: {args.out}")


if __name__ == "__main__":
    main()
