"""Attack ViT-B/16's 52 GB of fwd+bwd HBM traffic (VERDICT r4 item 1).

benchmarks/imagenet_roofline.md proved the 49%-MFU bandwidth ceiling AT
TODAY'S TRAFFIC (51.9 GB fwd+bwd + 5.8 GB optimizer per step, batch 64).
This benchmark measures every traffic lever at the ViT-B shape itself,
so each row either moves the ceiling or proves its slice irreducible:

- remat full / dots / dots_nb: recompute activations in the backward
  instead of storing them (jax.checkpoint around the network forward
  only; bench at the bandwidth-bound shape where it can win, unlike the
  compute-bound 5M shape of benchmarks/remat.md where it loses).
- bf16 AdamW moments (optax.adamw(mu_dtype=bfloat16)): halves the
  2x-86.5M-param moment read+write slice of the optimizer's 5.8 GB.
- batch 128: arithmetic-intensity evidence — weight reads amortize over
  2x the batch, so if MFU rises the per-sample traffic was weight-read
  bound, not activation bound.
- flash attention with an N=197-tuned q-block (block_q=112: pad
  197->224 instead of 256 on the query axis; the kv axis stays 256 —
  the score tile's minor dim must be a lane multiple): the measured
  answer to "can a tuned block beat XLA at ViT-B's sequence length".

MFU uses the BASELINE step's XLA cost-analysis FLOPs as the useful-work
numerator for every variant (remat adds recompute FLOPs that are not
useful work). Writes benchmarks/vitb_mfu.md.

Run on a QUIET host:  python tools/bench_vitb_mfu.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK_FLOPS = 197e12  # v5e bf16
PEAK_BW = 819e9      # v5e HBM B/s


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def cost(lowered):
    try:
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0))
    except Exception as e:  # noqa: BLE001
        log(f"cost_analysis unavailable: {e}")
        return 0.0, 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--quick", action="store_true",
                    help="tiny shape smoke (CPU)")
    args = ap.parse_args()
    if args.quick:
        args.dim, args.depth, args.heads, args.batch = 64, 2, 2, 4

    import jax
    import jax.numpy as jnp
    import optax

    from mop_tpu.models import ViT_MoP
    from mop_tpu.parallel import (make_imagenet_train_step, make_mesh,
                                  replicate, shard_batch)
    from mop_tpu.utils import jitted_init

    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    mesh = make_mesh()
    img = 32 if args.quick else 224
    patch = 16
    rng = jax.random.PRNGKey(0)
    model = ViT_MoP(dim=args.dim, depth=args.depth, heads=args.heads,
                    n_classes=1000, patch=patch, img_size=img)
    params0 = jitted_init(model, {"params": rng, "dropout": rng},
                          jnp.zeros((2, 3, img, img)), train=True)
    params0 = jax.tree_util.tree_map(np.asarray, params0)
    n_params = sum(int(p.size) for p in jax.tree_util.tree_leaves(params0))
    log(f"ViT dim {args.dim} depth {args.depth}: {n_params/1e6:.1f}M params")

    rows = []
    base_flops = {}

    def measure(name, batch, remat="none", mu_dtype=None):
        b = batch
        x_u8 = np.random.RandomState(0).randint(
            0, 256, (b, 3, img, img), dtype=np.uint8)
        y = np.random.RandomState(1).randint(0, 1000, (b,)).astype(np.int32)
        tx = optax.adamw(1e-3, weight_decay=0.05, mu_dtype=mu_dtype)
        opt0 = jax.tree_util.tree_map(np.asarray, tx.init(params0))
        with mesh:
            xb, yb = shard_batch((x_u8, y), mesh)
            step = make_imagenet_train_step(
                model, tx, mesh, mean, std, n_classes=1000,
                use_randaug=True, remat=remat)
            p = replicate(params0, mesh)
            o = replicate(opt0, mesh)
            fl, by = cost(step.lower(p, o, xb, yb, rng))
            for i in range(2):
                p, o, m = step(p, o, xb, yb, jax.random.fold_in(rng, i))
            float(m["loss"])  # barrier (one scalar through the tunnel)
            best = float("inf")
            for w in range(3):
                t0 = time.perf_counter()
                for i in range(4):
                    p, o, m = step(p, o, xb, yb,
                                   jax.random.fold_in(rng, 100 + w * 8 + i))
                float(m["loss"])
                best = min(best, (time.perf_counter() - t0) / 4)
            del p, o
        ms = best * 1e3
        # useful-work FLOPs: the same-batch baseline's cost FLOPs
        useful = base_flops.get(batch, fl)
        if name.startswith("baseline"):
            base_flops[batch] = fl
            useful = fl
        mfu = useful / best / PEAK_FLOPS
        imgs = batch / best
        rows.append((name, batch, ms, fl / 1e12, by / 1e9, imgs, mfu))
        log(f"{name:<28} b={batch:<4} {ms:8.2f} ms  {fl/1e12:6.2f} TF "
            f"{by/1e9:6.2f} GB  {imgs:8,.0f} img/s  MFU {mfu*100:5.1f}%")
        return ms

    measure("baseline (bf16, no remat)", args.batch)
    measure("remat=full", args.batch, remat="full")
    measure("remat=dots", args.batch, remat="dots")
    measure("remat=dots_nb", args.batch, remat="dots_nb")
    measure("bf16 AdamW moments", args.batch, mu_dtype=jnp.bfloat16)
    measure("remat=full + bf16 moments", args.batch, remat="full",
            mu_dtype=jnp.bfloat16)
    b2 = args.batch * 2
    measure("baseline @ 2x batch", b2)
    measure("remat=full @ 2x batch", b2, remat="full")

    # ---- flash attention with an N=197-tuned q-block ----
    import jax as _jax
    from mop_tpu.ops import attention as ref_attn
    from mop_tpu.ops.fused import _flash_forward

    n = (img // patch) ** 2 + 1
    dk = args.dim // args.heads
    bh = args.batch * args.heads
    qkv = [np.random.RandomState(i).randn(bh, n, dk).astype(np.float32)
           for i in range(3)]
    qkv = [jnp.asarray(a, jnp.bfloat16) for a in qkv]

    def xla_fwd(q, k, v):
        s = ref_attn.scaled_scores(q, k)
        a = _jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bnm,bmd->bnd", a.astype(v.dtype), v)

    def bench_fwd(fn, *a, reps=20):
        out = fn(*a)
        np.asarray(jnp.ravel(out)[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*a)
            np.asarray(jnp.ravel(out)[0])
            best = min(best, (time.perf_counter() - t0) / reps)
        return best * 1e3

    attn_rows = []
    ms_xla = bench_fwd(_jax.jit(xla_fwd), *qkv)
    attn_rows.append(("XLA dense softmax", ms_xla, 1.0))
    try:
        for bq, bk, tag in ((128, 128, "default 128/128 (pad 256)"),
                            (112, 128, "tuned 112/128 (pad q 224)"),
                            (64, 128, "64/128 (small q tiles)"),):
            f = _jax.jit(lambda q, k, v, bq=bq, bk=bk: _flash_forward(
                q, k, v, causal=False, block_q=bq, block_k=bk))
            ms = bench_fwd(f, *qkv)
            attn_rows.append((f"flash {tag}", ms, ms_xla / ms))
            log(f"attn N={n}: flash {tag}: {ms:.3f} ms vs XLA {ms_xla:.3f}")
    except ValueError as e:  # pallas unavailable (CPU smoke)
        log(f"flash sweep skipped: {e}")

    out = os.path.join(REPO, "benchmarks", "vitb_mfu.md")
    with open(out, "w") as f:
        f.write(
            f"# ViT-B MFU levers: attacking the 52 GB (VERDICT r4 #1)\n\n"
            f"ViT-MoP dim {args.dim} depth {args.depth} heads "
            f"{args.heads}, {img}px/patch{patch} (N={n}), "
            f"{n_params/1e6:.1f}M params, full ImageNet train step "
            f"(augment+fwd/bwd+AdamW), bf16 compute, v5e (peak "
            f"{PEAK_FLOPS/1e12:.0f} TF bf16, {PEAK_BW/1e9:.0f} GB/s). "
            f"min-of-3 windows, scalar-fetch barrier. MFU numerator = "
            f"same-batch BASELINE cost-analysis FLOPs (remat recompute "
            f"is not useful work). XLA cost bytes are post-fusion "
            f"estimates (+-10%).\n\n"
            "| variant | batch | ms/step | step TF | GB moved | img/s |"
            " MFU |\n|---|---|---|---|---|---|---|\n")
        for name, b, ms, tf, gb, imgs, mfu in rows:
            f.write(f"| {name} | {b} | {ms:.2f} | {tf:.2f} | {gb:.2f} |"
                    f" {imgs:,.0f} | {mfu*100:.1f}% |\n")
        f.write("\n## Flash vs XLA at the model's N="
                f"{n} (fwd, bf16, BH={bh}, dk={dk}; RELATIVE ratios — "
                "absolute ms is tunnel-dispatch-bound)\n\n"
                "| variant | ms | vs XLA |\n|---|---|---|\n")
        for name, ms, ratio in attn_rows:
            f.write(f"| {name} | {ms:.3f} | {ratio:.2f}x |\n")
        f.write("\n(Analysis prose added after the run — see git log.)\n")
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
