"""Weight-only quantized decode in the regime it exists for.

At toy model sizes the single-token decode step is NOT weight-HBM-bound,
so int8/int4 dequant overhead outweighs the saved reads (measured 0.7-0.9x
at an 11M model, benchmarks/decode.md). This bench measures the regime
quantization targets: a 12-layer/1024-dim (~170M param) GPT-quartet where
the fp32 step is dominated by weight reads.

Reports scanned single-stream decode step time for fp32 / int8 / int4
weights plus greedy-token agreement vs the fp32 decode on a briefly
trained model. Writes benchmarks/quant_decode.md.

Run:  python tools/bench_quant_decode.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.bench_decode import timed, train_briefly  # noqa: E402
from tools.bench_speculative import BLOCK, T0, VOCAB, build  # noqa: E402

NEW = 300


def main():
    from mop_tpu.models import generate_cached
    from mop_tpu.models.generate import decode_step, prefill
    from mop_tpu.ops.quant import quantize_params, quantized_bytes

    platform = jax.devices()[0].platform
    model, p0 = build(12, 1024, 16, seed=1)
    print("training the 170M target briefly...", flush=True)
    params, loss = train_briefly(model, p0, None, VOCAB, steps=150)
    print(f"loss {loss:.3f}", flush=True)

    rs = np.random.RandomState(7)
    start, stride = rs.randint(0, VOCAB), rs.randint(1, 6)
    prompt = jnp.asarray(
        (start + stride * np.arange(T0)) % VOCAB, jnp.int32)[None]

    variants = [("fp32", params)]
    variants.append(("int8", quantize_params(params)))
    variants.append(("int4 (group 64)", quantize_params(params, bits=4)))

    def tf_agree(p, ref):
        """Teacher-forced next-token agreement vs the fp32 greedy tokens:
        every step sees the fp32-generated prefix, so one early flip does
        not cascade (free-run agreement is a first-divergence metric)."""
        logits0, cache = jax.jit(
            lambda pp, s: prefill(model, pp, s))(p, ref[:, :T0])

        def st(cache, tok):
            lg, cache = decode_step(model, p, cache, tok)
            return cache, jnp.argmax(lg, -1).astype(jnp.int32)

        @jax.jit
        def rest(p_, cache, toks):
            del p_  # closed over via st; arg keeps the jit cache honest
            return jax.lax.scan(st, cache, toks)[1]

        preds_rest = rest(p, cache, jnp.swapaxes(ref[:, T0:-1], 0, 1))
        preds = jnp.concatenate(
            [jnp.argmax(logits0, -1).astype(jnp.int32)[None],
             preds_rest], axis=0)
        return float(np.mean(np.asarray(preds).T == np.asarray(ref[:, T0:])))

    rows = []
    ref_toks = None
    base_ms = None
    for name, p in variants:
        stored, fp32b = quantized_bytes(p)

        # scanned 100-step decode in ONE jit: step time without dispatch
        def hundred(pp_, c, t):
            def st(carry, _):
                tok, cc = carry
                lg, cc = decode_step(model, pp_, cc, tok)
                return (jnp.argmax(lg, -1).astype(jnp.int32), cc), ()
            (tok, _), _ = jax.lax.scan(st, (t, c), None, length=100)
            return tok

        _, cache = jax.jit(lambda pp_, pr: prefill(model, pp_, pr))(
            p, prompt)
        _, dt = timed(jax.jit(hundred), p, cache, jnp.zeros((1,), jnp.int32))
        ms = dt * 10.0

        toks = np.asarray(jax.jit(
            lambda pp_, pr: generate_cached(model, pp_, pr,
                                            max_new_tokens=NEW))(p, prompt))
        if ref_toks is None:
            ref_toks, base_ms = toks, ms
            agree, tf = 1.0, 1.0
        else:
            agree = float(np.mean(toks[:, T0:] == ref_toks[:, T0:]))
            tf = tf_agree(p, jnp.asarray(ref_toks))
        rows.append((name, stored / 1e6, ms, base_ms / ms, tf, agree))
        print(f"{name}: {stored / 1e6:,.0f} MB weights, {ms:.3f} ms/step "
              f"({base_ms / ms:.2f}x), teacher-forced {tf:.1%}, free-run "
              f"{agree:.1%}", flush=True)

    out = os.path.join(REPO, "benchmarks", "quant_decode.md")
    with open(out, "w") as f:
        f.write(
            f"# Quantized decode at the weight-bound scale ({platform}, "
            "min-of-3)\n\n"
            "12-layer/1024-dim GPT-quartet (~170M params), batch 1, block "
            f"{BLOCK}, briefly trained (loss {loss:.3f}); scanned 100-step "
            "decode, no dispatch overhead. Agreement is measured over "
            f"{NEW} greedy tokens vs the fp32 weights, two ways: "
            "TEACHER-FORCED (every step sees the fp32-generated prefix — "
            "the per-step prediction quality) and FREE-RUN (the quantized "
            "model continues its own output — effectively a "
            "first-divergence position, since one early flip cascades "
            "through greedy decoding forever).\n\n"
            "| weights | stored MB | ms/step | speedup | teacher-forced | "
            "free-run |\n|---|---|---|---|---|---|\n")
        for name, mb, ms, sp, tf, ag in rows:
            f.write(f"| {name} | {mb:,.0f} | {ms:.3f} | {sp:.2f}x | "
                    f"{tf:.1%} | {ag:.1%} |\n")
        f.write(
            "\nAt toy sizes (11M params, batch 8) the same quantized step "
            "measured 0.7-0.9x — dequant overhead beats the saved reads "
            "when weights don't dominate traffic (benchmarks/decode.md). "
            "Quantization is a large-model, small-batch tool; the "
            "dispatch is left to the caller, who knows the deployment "
            "shape. Group size barely moves int4 quality (g16/g32/g64 "
            "within 1pp teacher-forced); the default stays 64.\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
