"""Measure fused flash attention vs the XLA path at the model shapes that
actually use it: GPT block_size=512 (causal) and Whisper n_audio_ctx=1500
(bidirectional), plus the long-sequence regime. Min-of-3, host-transfer
barrier. Writes benchmarks/flash_dispatch.md; the `_supported` threshold in
``mop_tpu/ops/fused.py`` cites this table.

Usage: python tools/bench_flash.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (label, batch*heads grouping, N, dk, causal)
SHAPES = [
    ("gpt_512", 8, 8, 512, 64, True),
    ("whisper_audio_1500", 8, 8, 1504, 64, False),
    ("long_1024", 8, 8, 1024, 64, True),
    ("long_2048", 4, 8, 2048, 64, True),
    ("long_4096", 2, 8, 4096, 64, True),
]


def time_fn(fn, *args, reps=10, windows=3):
    import jax

    out = None
    for _ in range(3):
        out = fn(*args)
    float(out.sum())  # barrier (block_until_ready no-op on axon)
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(out.sum())
        times.append((time.perf_counter() - t0) / reps * 1e3)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    import mop_tpu.ops.fused as F

    rows = []
    for label, b, h, n, dk, causal in SHAPES:
        rng = jax.random.PRNGKey(0)
        q = jax.random.normal(rng, (b, h, n, dk), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, n, dk),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, n, dk),
                              jnp.bfloat16)

        xla = jax.jit(lambda q, k, v: F.flash_attention(
            q, k, v, causal=causal, force=False))
        fused = jax.jit(lambda q, k, v: F.flash_attention(
            q, k, v, causal=causal, force=True))
        t_xla = time_fn(xla, q, k, v)
        t_fused = time_fn(fused, q, k, v)
        rows.append((label, b, h, n, dk, causal, t_xla, t_fused,
                     t_xla / t_fused))
        print(f"{label}: XLA {t_xla:.3f} ms vs flash {t_fused:.3f} ms "
              f"-> flash {t_xla / t_fused:.2f}x", file=sys.stderr)

    md = os.path.join(REPO, "benchmarks", "flash_dispatch.md")
    with open(md, "w") as f:
        f.write(
            "# Flash-attention dispatch measurement (v5e, min-of-3, bf16)\n\n"
            "| shape | B | H | N | dk | causal | XLA ms | flash ms | "
            "flash speedup |\n|---|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} | {r[4]} | {r[5]} "
                    f"| {r[6]:.3f} | {r[7]:.3f} | {r[8]:.2f}x |\n")
        f.write("\nThe `_supported` auto-dispatch threshold in "
                "`mop_tpu/ops/fused.py` cites this table.\n")
    print(json.dumps([{"shape": r[0], "xla_ms": round(r[6], 3),
                       "flash_ms": round(r[7], 3),
                       "speedup": round(r[8], 3)} for r in rows]))
    print(f"wrote {md}", file=sys.stderr)


if __name__ == "__main__" and "--tune" not in sys.argv:
    main()


def tune():
    """Sweep (block_q, block_k) per shape; prints the winners. The tuned
    defaults in ``fused._choose_block_pair`` cite this."""
    import functools

    import jax
    import jax.numpy as jnp

    import mop_tpu.ops.fused as F

    for label, b, h, n, dk, causal in SHAPES:
        rng = jax.random.PRNGKey(0)
        q = jax.random.normal(rng, (b * h, n, dk), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(rng, 1), (b * h, n, dk),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(rng, 2), (b * h, n, dk),
                              jnp.bfloat16)
        xla = jax.jit(lambda q, k, v: F.flash_attention(
            q.reshape(b, h, n, dk), k.reshape(b, h, n, dk),
            v.reshape(b, h, n, dk), causal=causal, force=False))
        t_x = time_fn(xla, q, k, v)
        best = (None, 1e30)
        print(f"{label}: XLA {t_x:.3f} ms", file=sys.stderr)
        for bq in (128, 256, 512):
            for bk in (128, 256, 512):
                if bq > 2 * n or bk > 2 * n:
                    continue
                fn = jax.jit(functools.partial(
                    F._flash_forward, causal=causal, block_q=bq,
                    block_k=bk))
                try:
                    t = time_fn(fn, q, k, v)
                except Exception as e:  # noqa: BLE001
                    print(f"  bq={bq} bk={bk}: FAIL {str(e)[:60]}",
                          file=sys.stderr)
                    continue
                print(f"  bq={bq} bk={bk}: {t:.3f} ms ({t_x/t:.2f}x vs "
                      "XLA)", file=sys.stderr)
                if t < best[1]:
                    best = ((bq, bk), t)
        print(f"{label}: best {best[0]} {best[1]:.3f} ms "
              f"({t_x/best[1]:.2f}x vs XLA)", file=sys.stderr)


if __name__ == "__main__" and "--tune" in sys.argv:
    tune()
    sys.exit(0)
