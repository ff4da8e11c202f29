"""Logprob-tracking overhead: tok/s with logprobs_topk off vs on.

The claim in DecodeEngine's ctor docstring is that tracking costs one
(B, vocab) log-softmax + top-k per step (fused into the existing jitted
step) plus a per-step host fetch of three small arrays — negligible
next to the decode matmuls. This measures it end-to-end on the device.

Run:  python tools/bench_logprobs.py    (writes benchmarks/logprobs.md)
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
BLOCK = 512
BUCKETS = [64, 128, 256, 512]


def main():
    from mop_tpu.models import TransformerConfig, create_gpt_quartet
    from mop_tpu.serving import DecodeEngine

    platform = jax.devices()[0].platform
    cfg = TransformerConfig(n_layer=6, n_head=8, n_embd=512, dropout=0.0,
                            block_size=BLOCK)
    model = create_gpt_quartet(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    rs = np.random.RandomState(0)
    jobs = [([int(t) for t in rs.randint(0, VOCAB, rs.randint(48, 250))],
             64) for _ in range(16)]

    def run(eng):
        rids = [eng.submit(p, n) for p, n in jobs]
        t = time.perf_counter()
        res = eng.run()
        dt = time.perf_counter() - t
        return dt, sum(len(res[r]) for r in rids)

    rows = []
    for label, k in (("off (logprobs_topk=0)", 0),
                     ("chosen + top-5", 5),
                     ("chosen + top-20", 20)):
        eng = DecodeEngine(model, params, max_batch=8,
                           prefill_buckets=BUCKETS, logprobs_topk=k)
        run(eng)  # warm every compile
        dt, toks = run(eng)
        rows.append((label, toks, dt, toks / dt))
        print(f"{label}: {toks} tokens in {dt:.2f}s -> "
              f"{toks / dt:,.0f} tok/s", flush=True)
    base = rows[0][3]

    out = os.path.join(REPO, "benchmarks", "logprobs.md")
    with open(out, "w") as f:
        f.write(
            f"# Logprob-tracking overhead ({platform})\n\n"
            f"GPT-quartet {n_params / 1e6:.0f}M params, block {BLOCK}, "
            "greedy continuous batching (max_batch 8, 16 mixed requests "
            "of 48-250 prompt / 64 new tokens), bucketed exact prefill; "
            "compiles excluded by a full warmup pass. Tracking adds one "
            "(B, vocab) fp32 log-softmax + top-k inside the jitted step "
            "and a per-step host fetch of (B,), (B, K) x2 arrays.\n\n"
            "| logprobs | tokens | wall s | tok/s | vs off |\n"
            "|---|---|---|---|---|\n")
        for label, toks, dt, tps in rows:
            f.write(f"| {label} | {toks} | {dt:.2f} | {tps:,.0f} | "
                    f"{tps / base:.3f}x |\n")
        f.write(
            "\nEvery emitted token also gets its raw-model logprob and "
            "top-K alternatives (serving engines + OpenAI logprobs "
            "fields; semantics and equality tests in "
            "tests/test_serving_logprobs.py).\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
