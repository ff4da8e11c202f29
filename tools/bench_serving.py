"""Serving-engine load benchmark: continuous batching, prefix caching,
and the HTTP front-end, measured end-to-end on the device.

Three questions a deployment cares about:
1. How does aggregate tokens/s scale with the slot-pool size when many
   requests are in flight (continuous batching vs one-at-a-time)?
2. What does prefix caching save when requests share a long system
   prompt (the workload it exists for)?
3. What does the HTTP layer cost vs driving the engine directly?

The reference has no serving story at all (SURVEY §0). Writes
benchmarks/serving.md.

Run:  python tools/bench_serving.py
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

VOCAB = 512
BLOCK = 512
BUCKETS = [64, 128, 256, 512]


def build():
    from mop_tpu.models import TransformerConfig, create_gpt_quartet

    cfg = TransformerConfig(n_layer=6, n_head=8, n_embd=512, dropout=0.0,
                            block_size=BLOCK)
    model = create_gpt_quartet(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))
    return model, params


def mixed_jobs(n, rs, t_lo=48, t_hi=250, new=64):
    return [([int(t) for t in rs.randint(0, VOCAB, rs.randint(t_lo, t_hi))],
             new) for _ in range(n)]


def run_engine(eng, jobs):
    """Submit everything, drain, return (wall seconds, emitted tokens)."""
    rids = [eng.submit(p, n) for p, n in jobs]
    t = time.perf_counter()
    res = eng.run()
    dt = time.perf_counter() - t
    return dt, sum(len(res[r]) for r in rids)


def main():
    from mop_tpu.serving import DecodeEngine, ServingServer

    platform = jax.devices()[0].platform
    model, params = build()
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    rs = np.random.RandomState(0)
    jobs = mixed_jobs(32, rs)

    # ---- 1. continuous-batching scaling over slot-pool size ----
    # warm and time the SAME engine (jit caches are per-instance; a real
    # server stays up, so steady-state is the honest number)
    batch_rows = []
    for mb in (1, 2, 4, 8, 16):
        eng = DecodeEngine(model, params, max_batch=mb,
                           prefill_buckets=BUCKETS)
        run_engine(eng, jobs[:2 * mb])  # warm every compile (prefill+step)
        dt, toks = run_engine(eng, jobs)
        batch_rows.append((mb, toks, dt, toks / dt))
        print(f"max_batch={mb}: {toks} tokens in {dt:.2f}s -> "
              f"{toks / dt:,.0f} tok/s", flush=True)
    base_tps = batch_rows[0][3]

    # ---- 2. prefix caching with a shared system prompt ----
    sys_prompt = [int(t) for t in rs.randint(0, VOCAB, 384)]
    mk_wave = lambda: [(sys_prompt + [int(t) for t in
                                      rs.randint(0, VOCAB, 8)], 32)
                       for _ in range(16)]
    prefix_rows = []
    for label, kw in (("no prefix cache", {}),
                      ("prefix cache (4 entries)",
                       {"prefix_cache_entries": 4})):
        eng = DecodeEngine(model, params, max_batch=8,
                           prefill_buckets=BUCKETS, **kw)
        # full-wave warmup: compiles (incl. donated-layout recompiles on
        # back-to-back admissions) AND the LRU — steady state. The timed
        # wave is FRESH requests sharing only the system prompt (the
        # workload prefix caching exists for).
        run_engine(eng, mk_wave())
        reused0 = eng.prefix_tokens_reused
        dt, toks = run_engine(eng, mk_wave())
        reused = eng.prefix_tokens_reused - reused0
        prefix_rows.append((label, toks, dt, toks / dt, reused))
        print(f"{label}: {toks} tokens in {dt:.2f}s -> {toks / dt:,.0f} "
              f"tok/s (prefix tokens reused: {reused})", flush=True)

    # ---- 3. HTTP front-end vs direct engine drive ----
    http_jobs = jobs[:16]
    eng_direct = DecodeEngine(model, params, max_batch=8,
                              prefill_buckets=BUCKETS)
    run_engine(eng_direct, http_jobs[:4])  # warm
    dt_direct, toks_direct = run_engine(eng_direct, http_jobs)

    eng_http = DecodeEngine(model, params, max_batch=8,
                            prefill_buckets=BUCKETS)
    rids = [eng_http.submit(p, n) for p, n in http_jobs[:4]]  # warm
    eng_http.run()
    srv = ServingServer(eng_http)
    srv.start()
    out_toks = [0] * len(http_jobs)

    def client(i):
        p, n = http_jobs[i]
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/generate",
            data=json.dumps({"prompt": p, "max_new_tokens": n}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            out_toks[i] = len(json.loads(r.read())["tokens"])

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(http_jobs))]
    t = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    dt_http = time.perf_counter() - t
    srv.stop()
    toks_http = sum(out_toks)
    print(f"direct: {toks_direct / dt_direct:,.0f} tok/s; HTTP "
          f"({len(http_jobs)} concurrent clients): "
          f"{toks_http / dt_http:,.0f} tok/s", flush=True)

    # ---- 4. paged KV pool vs dense slabs ----
    from mop_tpu.serving import PagedDecodeEngine

    paged_rows = []
    for label, mk_eng in (
        ("dense slabs (max_batch=8)",
         lambda: DecodeEngine(model, params, max_batch=8,
                              prefill_buckets=BUCKETS)),
        ("paged, same capacity (8x64 pages)",
         lambda: PagedDecodeEngine(model, params, max_batch=8, n_pages=64,
                                   page_size=64, prefill_buckets=BUCKETS)),
        ("paged, HALF the HBM (32 pages)",
         lambda: PagedDecodeEngine(model, params, max_batch=8, n_pages=32,
                                   page_size=64, prefill_buckets=BUCKETS)),
    ):
        eng = mk_eng()
        run_engine(eng, jobs[:8])  # warm compiles
        pre0 = getattr(eng, "preemptions", 0)
        dt, toks = run_engine(eng, jobs[:16])
        gb = (eng.cache_bytes() if hasattr(eng, "cache_bytes") else
              3 * 6 * 8 * 8 * BLOCK * 64 * 4) / 1e9
        pre = getattr(eng, "preemptions", 0) - pre0  # timed run only
        paged_rows.append((label, toks, dt, toks / dt, gb, pre))
        print(f"{label}: {toks} tokens in {dt:.2f}s -> {toks / dt:,.0f} "
              f"tok/s, cache {gb:.3f} GB, preemptions {pre}", flush=True)

    out = os.path.join(REPO, "benchmarks", "serving.md")
    with open(out, "w") as f:
        f.write(
            f"# Serving engine under load ({platform})\n\n"
            f"GPT-quartet {n_params / 1e6:.0f}M params, block {BLOCK}, "
            "greedy; mixed prompts 48-250 tokens, 64 new tokens each; "
            "bucketed exact prefill; compiles excluded by a warmup "
            "pass.\n\n"
            "## Continuous batching: aggregate tok/s vs slot-pool size "
            "(32 requests)\n\n"
            "| max_batch | tokens | wall s | tok/s | vs max_batch=1 |\n"
            "|---|---|---|---|---|\n")
        for mb, toks, dt, tps in batch_rows:
            f.write(f"| {mb} | {toks} | {dt:.2f} | {tps:,.0f} | "
                    f"{tps / base_tps:.2f}x |\n")
        f.write(
            "\nAbsolute tok/s is dominated by per-step dispatch latency "
            "(each engine step is one host-driven device call — inflated "
            "here by the remote-device tunnel); the SCALING column is the "
            "portable result: batching N requests costs about the same "
            "wall time as one. Kernel-level single-stream decode "
            "throughput is in benchmarks/decode.md.\n")
        f.write(
            "\n## Prefix caching: 16 requests sharing a 384-token system "
            "prompt (8-token tails, 32 new each)\n\n"
            "| engine | tokens | wall s | tok/s | prefix tokens reused |\n"
            "|---|---|---|---|---|\n")
        for label, toks, dt, tps, reused in prefix_rows:
            f.write(f"| {label} | {toks} | {dt:.2f} | {tps:,.0f} | "
                    f"{reused} |\n")
        f.write(
            "\nAt this model scale a single admission is dispatch-latency-"
            "bound (~34 ms measured for BOTH the bucketed 512-token "
            "prefill and the 8-token chunk continuation), so prefix "
            "caching buys wall time only once prefill is compute-bound "
            "(bigger model, longer prompt); what it always buys is the "
            "avoided prefill compute itself — the reused-tokens column.\n")
        f.write(
            f"\n## HTTP front-end (16 concurrent clients, one engine)\n\n"
            f"| path | tok/s |\n|---|---|\n"
            f"| direct engine drive | {toks_direct / dt_direct:,.0f} |\n"
            f"| HTTP POST /generate | {toks_http / dt_http:,.0f} |\n")
        f.write(
            "\n## Paged KV pool vs dense slabs (16 mixed requests, "
            "max_batch 8)\n\n"
            "| engine | tokens | wall s | tok/s | cache GB | preemptions "
            "|\n|---|---|---|---|---|---|\n")
        for label, toks, dt, tps, gb, pre in paged_rows:
            f.write(f"| {label} | {toks} | {dt:.2f} | {tps:,.0f} | "
                    f"{gb:.3f} | {pre} |\n")
        f.write(
            "\nPaging virtualizes the KV slabs: cache HBM tracks resident "
            "tokens (pool pages), not max_batch x block_size, so the same "
            "concurrency fits in half the memory (last row) at a small "
            "gather cost; when the pool runs dry the engine preempts the "
            "youngest request and re-prefills it exactly (token equality "
            "incl. preemption pinned in tests/test_serving_paged.py).\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
