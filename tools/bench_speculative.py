"""Speculative-decoding benchmark on the real chip.

A 2-layer draft proposes gamma tokens per round; the target verifies them
in one chunked cached forward. Both models are briefly trained on the same
noisy arithmetic-progression task so the draft actually agrees with the
target (random-init models disagree almost immediately and speculative
decoding degenerates to 1 token/round).

Speculative decoding only pays when the target's per-token step costs
meaningfully more than the draft's. A single-token decode step has a
latency floor (~0.1 ms of small-op overhead on v5e) regardless of model
size, so at toy scales BOTH steps sit on that floor and drafting just adds
steps — measured 0.4x at a 11M target. The headline table therefore uses a
target big enough to be weight-HBM-bound (the regime serving actually runs
in); the draft-vs-target single-step cost ratio is measured and reported.

Reports tokens/s and acceptance rate vs the target-only cached sampler
(generate_cached), plus the token-equality check (greedy speculative
decode is exact by construction). Writes benchmarks/speculative.md.

Run:  python tools/bench_speculative.py
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

from tools.bench_decode import timed, train_briefly  # noqa: E402

VOCAB = 512
BLOCK = 512
T0 = 16
NEW = 400
GAMMAS = (2, 4, 8)


def build(n_layer, n_embd, n_head, seed):
    from mop_tpu.models import TransformerConfig, create_gpt_quartet
    from mop_tpu.utils import jitted_init

    cfg = TransformerConfig(n_layer=n_layer, n_head=n_head, n_embd=n_embd,
                            dropout=0.0, block_size=BLOCK)
    model = create_gpt_quartet(VOCAB, cfg)
    params = jitted_init(model, jax.random.PRNGKey(seed),
                         jnp.zeros((2, 64), jnp.int32))
    return model, params


def main():
    from mop_tpu.models import generate_cached, speculative_generate
    from mop_tpu.models.generate import decode_step, prefill

    platform = jax.devices()[0].platform
    target, tp0 = build(12, 1024, 16, seed=1)
    draft, dp0 = build(2, 128, 4, seed=2)

    print("training target + draft on the progression task...", flush=True)
    tparams, tloss = train_briefly(target, tp0, None, VOCAB, steps=150)
    dparams, dloss = train_briefly(draft, dp0, None, VOCAB, steps=600)
    print(f"target loss {tloss:.3f}, draft loss {dloss:.3f}", flush=True)

    # single-step cost ratio: what drafting actually costs per token
    # (scanned 100-step loop in ONE jit — a python loop would measure the
    # axon tunnel's dispatch latency, not the step)
    step_ms = {}
    for name, m, p in (("target", target, tparams), ("draft", draft, dparams)):
        _, cache = jax.jit(lambda pp_, pr, m=m: prefill(m, pp_, pr))(
            p, jnp.zeros((1, T0), jnp.int32))

        def hundred(pp_, c, t, m=m):
            def st(carry, _):
                tok, cc = carry
                lg, cc = decode_step(m, pp_, cc, tok)
                return (jnp.argmax(lg, -1).astype(jnp.int32), cc), ()
            (tok, _), _ = jax.lax.scan(st, (t, c), None, length=100)
            return tok

        fn = jax.jit(hundred)
        _, dt = timed(fn, p, cache, jnp.zeros((1,), jnp.int32))
        step_ms[name] = dt * 10.0  # ms per step
    ratio = step_ms["target"] / step_ms["draft"]
    print(f"single-step cost: target {step_ms['target']:.3f} ms, draft "
          f"{step_ms['draft']:.3f} ms ({ratio:.1f}x)", flush=True)

    rs = np.random.RandomState(7)
    start, stride = rs.randint(0, VOCAB), rs.randint(1, 6)
    prompt = jnp.asarray(
        (start + stride * np.arange(T0)) % VOCAB, jnp.int32)[None]

    base_fn = jax.jit(
        lambda p, pr: generate_cached(target, p, pr, max_new_tokens=NEW))
    out_b, dt_b = timed(base_fn, tparams, prompt)
    tok_b = NEW / dt_b
    print(f"target-only cached: {tok_b:,.0f} tok/s", flush=True)

    rows = []
    for gamma in GAMMAS:
        spec_fn = jax.jit(
            lambda tp, dp, pr, g=gamma: speculative_generate(
                target, tp, draft, dp, pr, max_new_tokens=NEW, gamma=g,
                return_stats=True))
        (out_s, stats), dt_s = timed(spec_fn, tparams, dparams, prompt)
        equal = bool(np.array_equal(np.asarray(out_s), np.asarray(out_b)))
        acc = float(stats["accepted"]) / max(1.0, float(stats["drafted"]))
        tok_s = NEW / dt_s
        rows.append((gamma, tok_s, tok_s / tok_b, int(stats["rounds"]),
                     acc, equal))
        print(f"gamma={gamma}: {tok_s:,.0f} tok/s ({tok_s / tok_b:.2f}x), "
              f"{int(stats['rounds'])} rounds, acceptance {acc:.1%}, "
              f"tokens equal: {equal}", flush=True)

    out = os.path.join(REPO, "benchmarks", "speculative.md")
    with open(out, "w") as f:
        f.write(
            "# Speculative decoding (greedy, batch 1, "
            f"{platform}, min-of-3)\n\n"
            "Target: 12-layer/1024-dim GPT-quartet (~170M params); draft: "
            "2-layer/128-dim, both briefly trained on the same noisy "
            f"progression task (target loss {tloss:.3f}, draft loss "
            f"{dloss:.3f}). {NEW} greedy tokens from a {T0}-token prompt, "
            f"block {BLOCK}.\n\nMeasured single-step cost: target "
            f"{step_ms['target']:.3f} ms vs draft {step_ms['draft']:.3f} ms "
            f"(**{ratio:.1f}x**) — the draft sits near the ~0.1 ms small-op "
            "latency floor of a single-token step while the target is "
            "weight-HBM-bound.\n\nGreedy speculative decoding is exact by "
            "construction (every emitted token is the target's own argmax "
            "given the same prefix); the `tokens equal` column is the "
            "measured check against `generate_cached`.\n\n"
            f"Target-only cached sampler: **{tok_b:,.0f} tok/s**.\n\n"
            "| gamma | tok/s | vs target-only | rounds | acceptance | "
            "tokens equal |\n|---|---|---|---|---|---|\n")
        for g, t, sp, r, a, eq in rows:
            f.write(f"| {g} | {t:,.0f} | {sp:.2f}x | {r} | {a:.1%} | "
                    f"{eq} |\n")
        f.write(
            "\nEach round costs gamma (+1 when all accepted) draft steps "
            "plus ONE target forward over gamma+1 positions and emits "
            "1..gamma+1 tokens — the speedup is bounded by the acceptance "
            "rate and the draft/target cost ratio. At toy target sizes "
            "(11M params) both steps sit on the latency floor and "
            "speculation measured 0.4x — the regime where it pays is "
            "exactly the memory-bound large-target regime above.\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
