"""Open-loop serving SLO benchmark: latency under offered load.

Every other serving benchmark here is CLOSED-loop (submit a wave, measure
aggregate tok/s) — that hides queueing. This is the standard open-loop
serving result (VERDICT r4 item 3): requests arrive by a POISSON process
at a swept offered rate lambda against the compute-bound 179M GPT-quartet
config of benchmarks/serving_large.md, and we report per-rate p50/p99
TTFT (submit -> first token) and TPOT (mean inter-token time past the
first) plus the saturation knee — the rate where the queue stops
draining and TTFT departs from its light-load plateau.

Percentiles are reported twice: exact (from raw per-request samples) and
through the SAME histogram buckets the HTTP front-end exports on
/metrics (serving/http.py _Histogram), so the benchmark validates the
production observability path too.

Methodology: single engine-driving loop (exactly the HTTP worker's
structure): at each iteration submit every request whose scheduled
arrival time has passed, then step() once and timestamp emissions.
Arrival schedules are pre-drawn (seeded exponential gaps), so the
offered load is independent of service behavior = open loop. The
capacity estimate for centering the sweep comes from one closed-loop
wave first.

The reference has no serving stack (SURVEY §0). Writes
benchmarks/serving_slo.md. Run on a QUIET host:
  python tools/bench_serving_slo.py [--quick]
"""

from __future__ import annotations

import argparse
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
PROMPT_LEN = 128
NEW = 32
MB = 4


def build(quick=False):
    from mop_tpu.models import TransformerConfig, create_gpt_quartet
    from mop_tpu.utils import jitted_init

    if quick:  # CPU smoke: tiny model, same machinery
        cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=64,
                                dropout=0.0, block_size=256)
    else:
        cfg = TransformerConfig(n_layer=12, n_head=16, n_embd=1024,
                                dropout=0.0, block_size=BLOCK)
    model = create_gpt_quartet(VOCAB, cfg)
    params = jitted_init(model, jax.random.PRNGKey(1),
                         jnp.zeros((2, 64), jnp.int32))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    return model, params, n


def make_engine(model, params, prompt_len):
    from mop_tpu.serving import DecodeEngine

    return DecodeEngine(model, params, max_batch=MB,
                        prefill_buckets=[prompt_len])


def capacity_probe(model, params, rng, prompt_len, new, n_req=8):
    """Closed-loop service rate (requests/s) to center the sweep.

    Warm-up runs on the SAME engine instance: each engine's jitted step
    closures are per-instance, so a fresh engine would recompile inside
    the timed window."""
    eng = make_engine(model, params, prompt_len)
    jobs = [rng.integers(0, VOCAB, prompt_len).tolist()
            for _ in range(n_req)]
    for p in jobs[:2]:  # warm both the prefill bucket and the step
        eng.submit(p, 2)
    eng.run()
    rids = [eng.submit(p, new) for p in jobs]
    t0 = time.perf_counter()
    eng.run()
    dt = time.perf_counter() - t0
    return n_req / dt


def open_loop(model, params, rate, n_req, seed, prompt_len, new):
    """One open-loop trial at offered rate ``rate`` req/s.

    Returns (ttft_samples, tpot_samples, wall, emitted_tokens)."""
    rng = np.random.default_rng(seed)
    gaps = rng.exponential(1.0 / rate, n_req)
    arrivals = np.cumsum(gaps)
    prompts = [rng.integers(0, VOCAB, prompt_len).tolist()
               for _ in range(n_req)]
    eng = make_engine(model, params, prompt_len)
    # warm compile paths outside the timed window ON THIS ENGINE (jit
    # closures are per-instance; a fresh engine would recompile in-loop)
    eng.submit(prompts[0], 2)
    eng.run()

    submit_t = {}
    first_t = {}
    last_t = {}
    ntok = {}
    nxt = 0
    t0 = time.perf_counter()
    emitted_total = 0
    while True:
        now = time.perf_counter() - t0
        while nxt < n_req and arrivals[nxt] <= now:
            rid = eng.submit(prompts[nxt], new)
            submit_t[rid] = time.perf_counter()
            nxt += 1
        if nxt < n_req and not eng.n_active and not eng._queue:
            # idle engine, next arrival in the future: sleep to it
            # (open loop — we do NOT pull work early)
            time.sleep(max(0.0, arrivals[nxt] - (time.perf_counter() - t0)))
            continue
        out = eng.step()
        tnow = time.perf_counter()
        for rid, toks in out.items():
            if toks and rid not in first_t:
                first_t[rid] = tnow
            last_t[rid] = tnow
            ntok[rid] = ntok.get(rid, 0) + len(toks)
            emitted_total += len(toks)
        if nxt >= n_req and not eng.n_active and not eng._queue:
            break
    wall = time.perf_counter() - t0
    ttft = [first_t[r] - submit_t[r] for r in submit_t if r in first_t]
    tpot = [(last_t[r] - first_t[r]) / (ntok[r] - 1)
            for r in first_t if ntok.get(r, 0) > 1]
    return np.array(ttft), np.array(tpot), wall, emitted_total


def pcts(x):
    if x.size == 0:
        return (float("nan"),) * 3
    return (float(np.percentile(x, 50)), float(np.percentile(x, 99)),
            float(np.mean(x)))


def hist_pcts(samples, buckets):
    """Feed samples through the http front-end's histogram and read the
    percentiles back out of the buckets (upper-bound estimate), exactly
    as a Prometheus query would."""
    from mop_tpu.serving.http import _Histogram

    h = _Histogram(buckets)
    for s in samples:
        h.observe(float(s))
    out = []
    for q in (0.50, 0.99):
        need = q * h.n
        seen = 0
        val = float("inf")
        for ub, c in zip(list(h.buckets) + [float("inf")],
                         list(h.counts)):
            seen += c
            if seen >= need:
                val = ub
                break
        out.append(val)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny model / CPU smoke")
    ap.add_argument("--n_req", type=int, default=40)
    ap.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "serving_slo.md"))
    args = ap.parse_args()

    from mop_tpu.serving.http import _TPOT_BUCKETS, _TTFT_BUCKETS

    prompt_len = 16 if args.quick else PROMPT_LEN
    new = 8 if args.quick else NEW
    n_req = 8 if args.quick else args.n_req

    model, params, n = build(args.quick)
    print(f"model: {n/1e6:.1f}M params, block {model.config.block_size}, "
          f"prompt {prompt_len}, {new} new tokens, {MB} slots",
          flush=True)
    rng = np.random.default_rng(0)
    cap = capacity_probe(model, params, rng, prompt_len, new)
    print(f"closed-loop capacity ~{cap:.2f} req/s", flush=True)

    fracs = [0.3, 0.6, 0.8, 0.95, 1.1, 1.3]
    rows = []
    for f in fracs:
        rate = cap * f
        ttft, tpot, wall, toks = open_loop(
            model, params, rate, n_req, seed=42, prompt_len=prompt_len,
            new=new)
        t50, t99, tmean = pcts(ttft)
        p50, p99, pmean = pcts(tpot)
        h50, h99 = hist_pcts(ttft, _TTFT_BUCKETS)
        g50, g99 = hist_pcts(tpot, _TPOT_BUCKETS)
        rows.append((f, rate, t50, t99, p50, p99, toks / wall,
                     h50, h99, g50, g99))
        print(f"offered {rate:6.2f} req/s ({f:4.2f}x cap): "
              f"TTFT p50/p99 {t50*1e3:7.1f}/{t99*1e3:7.1f} ms  "
              f"TPOT p50/p99 {p50*1e3:6.1f}/{p99*1e3:6.1f} ms  "
              f"agg {toks/wall:7.1f} tok/s", flush=True)

    # knee: first rate whose p99 TTFT exceeds 3x the lightest load's p99
    base99 = rows[0][3]
    knee = next((r for r in rows if r[3] > 3 * base99), None)

    with open(args.out, "w") as fh:
        fh.write(
            "# Open-loop serving SLO: latency vs offered load (tpu)\n\n"
            f"GPT-quartet {n/1e6:.0f}M params, block "
            f"{model.config.block_size}, {prompt_len}-token prompts, "
            f"{new} new tokens per request, {MB}-slot dense engine, "
            f"greedy, bucketed prefill. POISSON arrivals (seeded), "
            f"{n_req} requests per rate; rates centered on the "
            f"closed-loop capacity {cap:.2f} req/s. Single "
            f"engine-driving loop = the HTTP worker's structure; "
            f"compile warmed. Exact percentiles from raw samples; "
            f"`hist` columns re-derive them through the /metrics "
            f"histogram buckets (serving/http.py) as a Prometheus "
            f"query would (upper-bound per bucket).\n\n"
            "| offered (x cap) | req/s | TTFT p50 | TTFT p99 | "
            "TPOT p50 | TPOT p99 | agg tok/s | hist TTFT p50/p99 | "
            "hist TPOT p50/p99 |\n|---|---|---|---|---|---|---|---|---|\n")
        for (f, rate, t50, t99, p50, p99, agg, h50, h99, g50,
             g99) in rows:
            fh.write(f"| {f:.2f} | {rate:.2f} | {t50*1e3:.1f} ms | "
                     f"{t99*1e3:.1f} ms | {p50*1e3:.1f} ms | "
                     f"{p99*1e3:.1f} ms | {agg:.1f} | "
                     f"{h50*1e3:.0f}/{h99*1e3:.0f} ms | "
                     f"{g50*1e3:.0f}/{g99*1e3:.0f} ms |\n")
        if knee is not None:
            fh.write(
                f"\n**Saturation knee: ~{knee[1]:.2f} req/s "
                f"({knee[0]:.2f}x closed-loop capacity)** — first swept "
                f"rate where p99 TTFT exceeds 3x the light-load p99 "
                f"({base99*1e3:.0f} ms): the queue stops draining and "
                f"waiting time, not service time, dominates TTFT.\n")
        else:
            fh.write("\nNo knee within the swept range (p99 TTFT stayed "
                     "within 3x of light load).\n")
        fh.write("\nCaveat (as for every serving table here): absolute "
                 "latencies include the axon tunnel's per-dispatch "
                 "cost; the SHAPE of the latency-vs-load curve and the "
                 "knee location relative to capacity are the portable "
                 "result.\n")
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
