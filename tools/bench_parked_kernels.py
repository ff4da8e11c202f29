"""Parked-kernel crossover study (VERDICT r2 #4): multihop and dense-gate
train kernels lose to XLA at the CIFAR shapes — find WHERE each kernel wins
(N sweep on the real chip), retune the dispatch to that envelope, and write
the roofline argument for the shapes where XLA is at speed-of-light.

Writes benchmarks/parked_kernels.md.  Run:  python tools/bench_parked_kernels.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)

HBM_GBPS = 819e9  # v5e chip HBM bandwidth


K_SCAN = 10  # device-side iterations per dispatch (amortizes the ~200ms
# axon-tunnel round-trip that otherwise dominates sub-10ms kernels)


def timed(fn, p, x, windows=3):
    """Best per-iteration seconds of a K_SCAN-iteration device-side scan of
    ``fn(p, x_k)`` over K distinct inputs (loop-invariant bodies would be
    hoisted out of the scan by XLA, so each iteration gets its own x)."""
    xs = x[None] * (1.0 + 1e-3 * jnp.arange(
        K_SCAN, dtype=jnp.float32)).astype(x.dtype)[:, None, None, None]

    @jax.jit
    def looped(p, xs):
        def body(c, xk):
            out = fn(p, xk)
            return c + jnp.sum(
                jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    float(looped(p, xs))  # warmup + barrier
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        float(looped(p, xs))
        best = min(best, time.perf_counter() - t0)
    return best / K_SCAN


def bench_multihop():
    """MultiHopMSA eval forward, fused kernel vs composed XLA, N sweep at
    constant token volume (B*N fixed)."""
    from mop_tpu import config as mcfg
    from mop_tpu.models import MultiHopMSA

    dim, heads, hops = 256, 4, 3
    rows = []
    token_budget = 64 * 256  # B*N
    for n in (64, 128, 256, 512):
        b = max(1, token_budget // n)
        m = MultiHopMSA(dim=dim, heads=heads, hops=hops,
                        gates=dict(base=1.0, and_=1.0, or_=0.5, not_=0.25,
                                   chain=0.75))
        x32 = jax.random.normal(jax.random.PRNGKey(n), (b, n, dim))
        p = _bf16(jax.jit(m.init)(jax.random.PRNGKey(1), x32))
        x = x32.astype(jnp.bfloat16)

        def run(fused):
            def f(p, x):
                mcfg.config.fused_multihop = fused
                return m.apply(p, x)
            return timed(f, p, x)

        try:
            dt_x = run(False)
            dt_f = run(True)
        except Exception as e:
            print(f"multihop N={n}: skipped ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
            continue
        # Composed-path HBM traffic for the N^2 state (bf16): S1,S2,A1,A2,
        # chain partials, smix, A — ~8 maps written+read once each.
        maps_bytes = 8 * 2 * b * heads * n * n * 2
        floor_ms = maps_bytes / HBM_GBPS * 1e3
        rows.append((n, b, dt_x * 1e3, dt_f * 1e3, dt_x / dt_f, floor_ms))
        print(f"multihop N={n} B={b}: XLA {dt_x*1e3:.2f} ms, fused "
              f"{dt_f*1e3:.2f} ms ({dt_x/dt_f:.2f}x), N^2-traffic floor "
              f"{floor_ms:.2f} ms", flush=True)
    return rows


def bench_dense_train():
    """EdgewiseMSA dense-gate TRAIN (loss+grad), fused in-kernel-VJP vs XLA
    autodiff, N sweep (kernel envelope n <= 128)."""
    from mop_tpu import config as mcfg
    from mop_tpu.models import EdgewiseMSA

    dim, heads, v_ = 224, 4, 2
    rows = []
    token_budget = 64 * 256
    for n in (64, 128):
        b = max(1, token_budget // n)
        m = EdgewiseMSA(dim=dim, heads=heads, n_views=v_, share_qkv=True,
                        gate_mode="dense", gate_init="and", use_k3=False,
                        beta_not=0.5, attn_drop=0.0, proj_drop=0.0)
        x32 = jax.random.normal(jax.random.PRNGKey(n), (b, n, dim))
        p = _bf16(jax.jit(m.init)(jax.random.PRNGKey(1), x32))
        x = x32.astype(jnp.bfloat16)
        dy = jax.random.normal(jax.random.PRNGKey(2), x.shape, jnp.bfloat16)

        def run(fused):
            def f(p, x):
                mcfg.config.fused_attention = True
                mcfg.config.fused_edgewise_train = fused
                y = m.apply(p, x, train=True,
                            rngs={"dropout": jax.random.PRNGKey(3)})
                return jnp.sum(y.astype(jnp.float32) * dy.astype(jnp.float32))
            # NOTE: dense train dispatch is currently eval-only in the
            # module; force via the kernel API for the fused arm.
            if fused:
                from mop_tpu.ops import fused as F

                def f2(p, x):
                    # module currently composes at train for dense; emulate
                    # a train dispatch by calling the kernel path with
                    # train=False math (attn_drop==0 -> identical function).
                    mcfg.config.fused_attention = True
                    mcfg.config.fused_edgewise_train = True
                    y = m.apply(p, x, train=False)
                    return jnp.sum(
                        y.astype(jnp.float32) * dy.astype(jnp.float32))
                return timed(jax.grad(f2, argnums=(0, 1)), p, x)

            def f3(p, x):
                mcfg.config.fused_attention = False
                y = m.apply(p, x, train=False)
                return jnp.sum(y.astype(jnp.float32) * dy.astype(jnp.float32))
            return timed(jax.grad(f3, argnums=(0, 1)), p, x)

        try:
            dt_x = run(False)
            dt_f = run(True)
        except Exception as e:
            print(f"dense-train N={n}: skipped ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
            continue
        c = 2 * v_ + 2
        hidden = 16
        stack_bytes = b * heads * n * n * (c + hidden + 4) * 2 * 2
        floor_ms = stack_bytes / HBM_GBPS * 1e3
        rows.append((n, b, dt_x * 1e3, dt_f * 1e3, dt_x / dt_f, floor_ms))
        print(f"dense-train N={n} B={b}: XLA {dt_x*1e3:.2f} ms, fused "
              f"{dt_f*1e3:.2f} ms ({dt_x/dt_f:.2f}x), stack-traffic floor "
              f"{floor_ms:.2f} ms", flush=True)
    return rows


def main():
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        print("needs a real TPU")
        return 2
    mh = bench_multihop()
    dt = bench_dense_train()
    out = os.path.join(REPO, "benchmarks", "parked_kernels.md")
    with open(out, "w") as f:
        f.write("# Parked-kernel crossover study\n\n")
        f.write(f"Platform `{platform}` ({jax.devices()[0].device_kind}), "
                "bf16 operands, min-of-3 windows, constant token volume "
                "(B*N = 16384).\n\n")
        f.write("## Multihop (D-mode) eval forward\n\n")
        f.write("| N | B | XLA ms | fused ms | fused speedup | "
                "N^2-HBM floor ms |\n|---|---|---|---|---|---|\n")
        for r in mh:
            f.write(f"| {r[0]} | {r[1]} | {r[2]:.2f} | {r[3]:.2f} | "
                    f"{r[4]:.2f}x | {r[5]:.2f} |\n")
        f.write("\n## Edgewise dense-gate train (loss + grads)\n\n")
        f.write("| N | B | XLA ms | fused ms | fused speedup | "
                "stack-HBM floor ms |\n|---|---|---|---|---|---|\n")
        for r in dt:
            f.write(f"| {r[0]} | {r[1]} | {r[2]:.2f} | {r[3]:.2f} | "
                    f"{r[4]:.2f}x | {r[5]:.2f} |\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
