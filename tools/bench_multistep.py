"""Multi-step decoding benchmark: engine tok/s vs burst size on the chip.

benchmarks/serving.md shows the continuous-batching engines are
DISPATCH-latency-bound (one fixed-shape device call per token, ~ms of
host/tunnel overhead each). ``DecodeEngine.step(n_tokens=k)`` scans k
steps inside one dispatch; this measures the amortization at the GPT
serving shape. Appends a section to benchmarks/serving.md.

Run: python tools/bench_multistep.py
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


def main():
    from mop_tpu.models import TransformerConfig, create_gpt_quartet
    from mop_tpu.serving import DecodeEngine
    from mop_tpu.utils import jitted_init

    platform = jax.devices()[0].platform
    vocab = 512
    cfg = TransformerConfig(n_layer=6, n_head=6, n_embd=384, dropout=0.0,
                            block_size=512)
    model = create_gpt_quartet(vocab, cfg)
    params = jitted_init(model, jax.random.PRNGKey(1),
                         jnp.zeros((1, 8), jnp.int32))
    rs = np.random.RandomState(0)
    prompts = [rs.randint(0, vocab, (16,)).tolist() for _ in range(8)]
    max_new = 384

    def serve_pass(make_engine, k):
        """One full serve; returns (tok/s, engine_steps). Engines are
        rebuilt per pass but jit caches live per instance, so the first
        step of each pass warms that instance's compiles outside the
        timed region."""
        eng = make_engine()
        for p in prompts:
            eng.submit(p, max_new_tokens=max_new)
        eng.step(n_tokens=k)
        t0 = time.perf_counter()
        eng.run(n_tokens=k)
        dt = time.perf_counter() - t0
        return eng.tokens_generated / dt, eng.engine_steps

    def best_of(make_engine, k, passes=2):
        # the axon tunnel's dispatch latency jitters up to 2x between
        # runs — take the best of 2 full serves per point
        best = (0.0, 0)
        for _ in range(passes):
            tps, steps = serve_pass(make_engine, k)
            if tps > best[0]:
                best = (tps, steps)
        return best

    rows = []
    for k in (1, 4, 16, 64):
        tps, steps = best_of(
            lambda: DecodeEngine(model, params, max_batch=8), k)
        rows.append((k, tps, steps))
        print(f"n_tokens={k}: {tps:,.0f} tok/s "
              f"({steps} engine steps)", flush=True)

    base = rows[0][1]
    md = [
        "",
        "## Multi-step decoding: tok/s vs burst size (re-measured round 5, per-slot fallback engine)",
        "",
        f"Platform `{platform}`; 8 concurrent requests, 11M-param "
        "quartet LM, 384 new tokens each, greedy. `step(n_tokens=k)` "
        "scans k fixed-shape steps in ONE dispatch (token-identical — "
        "tests/test_serving_multistep.py); the dispatch-latency bound "
        "amortizes:",
        "",
        "| burst k | tok/s (aggregate) | vs k=1 |",
        "|---|---|---|",
    ]
    for k, tps, _steps in rows:
        md.append(f"| {k} | {tps:,.0f} | {tps / base:.1f}x |")
    md += [
        "",
        "Serve with `ServingServer(..., steps_per_dispatch=k)`; tokens "
        "then stream in bursts of up to k, so pick k against the "
        "latency SLO (TTFT is unaffected — admission still happens "
        "between bursts — but a stream's inter-chunk gap grows ~k x).",
        "",
    ]

    # ---- paged engine bursts (round 5): same workload over a page pool
    from mop_tpu.serving.paged import PagedDecodeEngine

    page_size = 32
    n_pages = 8 * (512 // page_size)  # full dense-equivalent capacity
    prows = []
    for k in (1, 4, 16, 64):
        tps, steps = best_of(
            lambda: PagedDecodeEngine(model, params, max_batch=8,
                                      n_pages=n_pages,
                                      page_size=page_size), k)
        prows.append((k, tps, steps))
        print(f"paged n_tokens={k}: {tps:,.0f} tok/s "
              f"({steps} engine steps)", flush=True)

    pbase = prows[0][1]
    md += [
        "",
        "## Paged engine multi-step (round 5): tok/s vs burst size",
        "",
        f"Same workload on `PagedDecodeEngine` (page_size {page_size}, "
        f"{n_pages} pages = dense-equivalent capacity); the burst "
        "pre-allocates every page it will write, so preemption never "
        "fires mid-burst (token-identical — "
        "tests/test_serving_paged_multistep.py):",
        "",
        "| burst k | paged tok/s | vs paged k=1 | vs dense same-k |",
        "|---|---|---|---|",
    ]
    for (k, tps, _), (_, dtps, _) in zip(prows, rows):
        md.append(f"| {k} | {tps:,.0f} | {tps / pbase:.1f}x | "
                  f"{tps / dtps:.2f}x |")
    md += [
        "",
        "Paging costs one table-gather per step on top of the dense "
        "math; the burst amortizes the same dispatch bound, so the "
        "memory-oversubscription engine no longer pays a 1-dispatch-"
        "per-token serving tax.",
        "",
    ]
    with open(os.path.join(REPO, "benchmarks", "serving.md"), "a") as f:
        f.write("\n".join(md))
    print("appended to benchmarks/serving.md")


if __name__ == "__main__":
    main()
