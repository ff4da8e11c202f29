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

    rows = []
    for k in (1, 4, 16, 64):
        eng = DecodeEngine(model, params, max_batch=8)
        for p in prompts:
            eng.submit(p, max_new_tokens=max_new)
        # warm the compiles outside the timed window
        eng.step(n_tokens=k)
        t0 = time.perf_counter()
        eng.run(n_tokens=k)
        dt = time.perf_counter() - t0
        toks = eng.tokens_generated
        rows.append((k, toks / dt, eng.engine_steps))
        print(f"n_tokens={k}: {toks / dt:,.0f} tok/s "
              f"({eng.engine_steps} engine steps)", flush=True)

    base = rows[0][1]
    md = [
        "",
        "## Multi-step decoding (round 4): tok/s vs burst size",
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
    with open(os.path.join(REPO, "benchmarks", "serving.md"), "a") as f:
        f.write("\n".join(md))
    print("appended to benchmarks/serving.md")


if __name__ == "__main__":
    main()
