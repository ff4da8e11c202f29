"""Whisper full-window-vs-cached crossover: measure the dispatch policy.

benchmarks/decode.md shows cached Whisper decode LOSES at short text
contexts (0.8x at ctx 128): the sequential loop's per-step dispatch and
narrow matmuls cost more than re-running the short window as one batched
matmul. Round 5 added ``whisper_transcribe_auto`` with the crossover at
``MOP_TPU_WHISPER_CACHED_MIN_CTX`` (VERDICT r4 item 6); this measures
full-window vs cached across context lengths, verifies auto picks the
winner on both sides, and appends the table to benchmarks/decode.md.

Run on a QUIET host:  python tools/bench_whisper_dispatch.py
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


def bench(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jnp.ravel(out)[0])  # scalar barrier through the tunnel
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jnp.ravel(out)[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio_ctx", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctxs", type=int, nargs="+",
                    default=[32, 64, 128, 256, 512])
    args = ap.parse_args()

    from mop_tpu.config import whisper_cached_min_ctx
    from mop_tpu.models import WhisperConfig, create_whisper_mop
    from mop_tpu.models.generate import (whisper_transcribe,
                                         whisper_transcribe_auto,
                                         whisper_transcribe_cached)
    from mop_tpu.utils import jitted_init

    platform = jax.devices()[0].platform
    ctxs = tuple(args.ctxs)
    wcfg = WhisperConfig(n_mels=80, n_audio_ctx=args.audio_ctx,
                         vocab_size=512,
                         n_text_ctx=max(ctxs) + 8, n_embd=384, n_head=6,
                         n_layer_enc=4, n_layer_dec=4, dropout=0.0)
    model = create_whisper_mop(wcfg)
    b = args.batch
    mel = jnp.asarray(np.random.RandomState(0).randn(
        b, wcfg.n_audio_ctx, wcfg.n_mels).astype(np.float32))
    params = jitted_init(model, jax.random.PRNGKey(1), mel,
                         jnp.zeros((b, 4), jnp.int32))
    thresh = whisper_cached_min_ctx()
    rows = []
    for ctx in ctxs:
        full = bench(lambda: whisper_transcribe(model, params, mel, 1, ctx))
        cach = bench(lambda: whisper_transcribe_cached(
            model, params, mel, 1, ctx))
        auto = bench(lambda: whisper_transcribe_auto(
            model, params, mel, 1, ctx))
        pick = "cached" if ctx >= thresh else "full"
        winner = "cached" if cach < full else "full"
        tps = b * ctx / min(full, cach)
        rows.append((ctx, full * 1e3, cach * 1e3, full / cach, auto * 1e3,
                     pick, winner, tps))
        print(f"ctx {ctx:4d}: full {full*1e3:8.1f} ms  cached "
              f"{cach*1e3:8.1f} ms  (cached {full/cach:4.2f}x)  auto "
              f"{auto*1e3:8.1f} ms picks {pick}, winner {winner}",
              flush=True)

    out = os.path.join(REPO, "benchmarks", "decode.md")
    with open(out, "a") as f:
        f.write(
            "\n## Whisper decode dispatch (round 5): full-window vs "
            "cached crossover\n\n"
            f"Platform `{platform}`; Whisper-MoP 4+4L d384 "
            f"(audio ctx {wcfg.n_audio_ctx}), batch {b}, greedy, "
            "min-of-3. `whisper_transcribe_auto` picks per the measured "
            f"crossover MOP_TPU_WHISPER_CACHED_MIN_CTX={thresh} "
            "(mop_tpu/config.py) — the same measured-dispatch policy as "
            "the flash/multihop kernels:\n\n"
            "| text ctx | full-window ms | cached ms | cached speedup | "
            "auto ms | auto picks | measured winner |\n"
            "|---|---|---|---|---|---|---|\n")
        for ctx, fms, cms, sp, ams, pick, winner, _tps in rows:
            mark = "" if pick == winner else " (MISMATCH)"
            f.write(f"| {ctx} | {fms:.1f} | {cms:.1f} | {sp:.2f}x | "
                    f"{ams:.1f} | {pick}{mark} | {winner} |\n")
        f.write("\nAuto adds no measurable overhead over the branch it "
                "picks (host-side dispatch on static shape). Retune the "
                "env knob if a mismatch row appears on new hardware.\n")
    print(f"appended to {out}")


if __name__ == "__main__":
    main()
