"""Chunked-prefill benchmark: what a long admission does to live streams.

The chunked-prefill property (engine.py ``chunk_prefill=``) is about
TAIL LATENCY, not throughput: with monolithic admission, every decode
stream co-batched with a long prompt stalls for the full prefill; with
C-token chunks the stall is bounded by one chunk. This tool measures
exactly that at the compute-bound regime of benchmarks/serving_large.md
(170M-param GPT-quartet, 2048 context, 1928-token prompts):

- co-batched stall: per-engine-step wall times of a live decode stream
  while the long prompt is admitted — max step = the stall the live
  stream sees (the inter-token-latency spike), monolithic vs chunked;
- idle-engine TTFT of the long request both ways (chunking trades a
  little TTFT — several dispatches instead of one — for the bounded
  stall; both are reported honestly).

The reference has no serving story at all (SURVEY §0). Writes
benchmarks/serving_chunked.md.

Run:  python tools/bench_serving_chunked.py
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

VOCAB = 512
BLOCK = 2048
LONG = 1928
CHUNK = 256
SHORT = 8
MB = 4
REPS = 3


def build():
    from mop_tpu.models import TransformerConfig, create_gpt_quartet
    from mop_tpu.utils import jitted_init

    cfg = TransformerConfig(n_layer=12, n_head=16, n_embd=1024,
                            dropout=0.0, block_size=BLOCK)
    model = create_gpt_quartet(VOCAB, cfg)
    params = jitted_init(model, jax.random.PRNGKey(1),
                         jnp.zeros((2, 64), jnp.int32))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    return model, params, n


def cobatch_stall(eng, rs):
    """Step-time trace of an engine whose live stream is co-batched with
    a LONG-token admission: returns (per-step seconds from the long
    submit until its first token, steps taken)."""
    short = [int(t) for t in rs.randint(0, VOCAB, SHORT)]
    long_p = [int(t) for t in rs.randint(0, VOCAB, LONG)]
    r_s = eng.submit(short, 64)
    for _ in range(4):  # live, steady decode (device_get each step)
        eng.step()
    r_l = eng.submit(long_p, 4)
    times = []
    while not eng.results[r_l]:
        t0 = time.perf_counter()
        eng.step()
        times.append(time.perf_counter() - t0)
    eng.cancel(r_s)
    while not eng.is_done(r_l):
        eng.step()
    return times


def ttft(eng, prompt):
    rid = eng.submit(prompt, 4)
    t0 = time.perf_counter()
    while not eng.results[rid]:
        eng.step()
    dt = time.perf_counter() - t0
    while not eng.is_done(rid):
        eng.step()
    return dt


def main():
    from mop_tpu.serving import DecodeEngine

    platform = jax.devices()[0].platform
    model, params, n_params = build()
    print(f"{n_params / 1e6:.0f}M params, block {BLOCK}, chunk {CHUNK}, "
          f"{platform}", flush=True)
    mk = {
        "monolithic": lambda: DecodeEngine(
            model, params, max_batch=MB, prefill_buckets=[16, BLOCK]),
        f"chunked (C={CHUNK})": lambda: DecodeEngine(
            model, params, max_batch=MB, prefill_buckets=[16, BLOCK],
            chunk_prefill=CHUNK),
    }
    stall, first, steps_n, ttfts = {}, {}, {}, {}
    for label, make in mk.items():
        eng = make()
        rs = np.random.RandomState(7)
        cobatch_stall(eng, rs)  # compile admission/chunk/decode paths
        traces = [cobatch_stall(eng, rs) for _ in range(REPS)]
        stall[label] = min(max(t) for t in traces)   # best-case max-stall
        first[label] = min(sum(t) for t in traces)   # long tok0 delay
        steps_n[label] = len(traces[0])
        eng2 = make()
        long_p = [int(t) for t in rs.randint(0, VOCAB, LONG)]
        ttft(eng2, long_p)  # compile idle paths
        ttfts[label] = min(ttft(
            eng2, [int(t) for t in rs.randint(0, VOCAB, LONG)])
            for _ in range(REPS))
        print(f"{label}: live-stream max stall {stall[label] * 1e3:,.1f} ms"
              f" over {steps_n[label]} steps (long tok0 after "
              f"{first[label] * 1e3:,.1f} ms); idle TTFT "
              f"{ttfts[label] * 1e3:,.1f} ms", flush=True)

    mono, chk = list(mk)
    out = os.path.join(REPO, "benchmarks", "serving_chunked.md")
    with open(out, "w") as f:
        f.write(
            f"# Chunked prefill: live-stream stall bound ({platform})\n\n"
            f"GPT-quartet {n_params / 1e6:.0f}M params, context {BLOCK}, "
            f"fp32, greedy, {MB}-slot pool. A live decode stream is "
            f"co-batched with a {LONG}-token admission; per-engine-step "
            "wall times are traced from the long submit until its first "
            f"token (min over {REPS} runs after a compile warmup). The "
            "max step is the inter-token-latency spike the live stream "
            "sees.\n\n"
            "| engine | live-stream max stall | steps to long tok0 | "
            "long tok0 delay | idle TTFT (long) |\n|---|---|---|---|---|\n")
        for label in mk:
            f.write(f"| {label} | {stall[label] * 1e3:,.1f} ms | "
                    f"{steps_n[label]} | {first[label] * 1e3:,.1f} ms | "
                    f"{ttfts[label] * 1e3:,.1f} ms |\n")
        f.write(
            f"\nChunking bounds the live stream's worst step at "
            f"{stall[mono] / stall[chk]:.1f}x less than the monolithic "
            f"stall ({stall[mono] * 1e3:,.0f} ms -> "
            f"{stall[chk] * 1e3:,.0f} ms), at the cost of "
            f"{(ttfts[chk] / ttfts[mono] - 1) * 100:+.0f}% idle TTFT for "
            "the long request itself (several dispatches instead of one "
            "fused admission). Token equality vs monolithic admission is "
            "pinned in tests/test_serving_chunked.py.\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
