"""Task-metric quality ladder for the lossy decode modes (VERDICT r3 #7).

Token-level "greedy agreement" (benchmarks/decode.md / quant_decode.md)
says how often a lossy mode picks the oracle token, but not whether the
disagreements matter. This measures what a user of the model measures:

- GPT: Δperplexity of held-out text SCORED THROUGH THE LOSSY DECODE PATH
  (incremental decode_step from an empty cache — every position's
  distribution is produced exactly as the serving engine would produce
  it) for fp32/bf16/int8 KV caches and int8/int4 weights, on a
  briefly-trained model with real margins.
- Whisper: ΔWER of cached greedy transcription (fp32 vs bf16 KV; int8 /
  int4 weights) on a briefly-trained synthetic mel->digit-sequence task.

Writes benchmarks/quality_ladder.md.  Run: python tools/bench_quality_ladder.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

VOCAB = 64


def _lm_data(steps, batch=32, t=64, seed=0):
    rs = np.random.RandomState(seed)
    start = rs.randint(0, VOCAB, (steps, batch, 1))
    stride = rs.randint(1, 6, (steps, batch, 1))
    return (start + stride * np.arange(t + 1)) % VOCAB


def train_lm(model, params, steps=200):
    ids = _lm_data(steps)
    tx = optax.adamw(3e-4)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, idx, tgt):
        def lf(p):
            _, loss = model.apply(p, idx, targets=tgt, train=False)
            return loss
        loss, g = jax.value_and_grad(lf)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    for s in range(steps):
        params, opt, loss = step(
            params, opt, jnp.asarray(ids[s, :, :-1], jnp.int32),
            jnp.asarray(ids[s, :, 1:], jnp.int32))
    return params, float(loss)


def decode_path_ppl(model, params, tokens, kv_dtype=jnp.float32):
    """Perplexity of (B, T) tokens with every position's distribution
    produced by the INCREMENTAL decode path (decode_step from an empty
    cache with the given KV dtype) — the distribution the serving
    engine actually samples from."""
    from mop_tpu.models.generate import decode_step, init_decode_cache, \
        model_n_views

    tokens = jnp.asarray(tokens, jnp.int32)
    b, t = tokens.shape

    @jax.jit
    def run(params, toks):
        cache = init_decode_cache(model.config, b, kv_dtype,
                                  n_views=model_n_views(model))

        def body(carry, tok_next):
            tok, cache, acc = carry
            logits, cache = decode_step(model, params, cache, tok)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(logp, tok_next[:, None], 1)[:, 0]
            return (tok_next, cache, acc + nll.sum()), None

        (_unused, cache, acc), _ = jax.lax.scan(
            body, (toks[:, 0], cache, jnp.float32(0.0)),
            toks[:, 1:].T)
        del _unused
        return acc

    acc = run(params, tokens)
    n = b * (t - 1)
    return float(np.exp(np.asarray(acc) / n))


def main():
    from mop_tpu.models import TransformerConfig, create_gpt_quartet
    from mop_tpu.ops.quant import quantize_params
    from mop_tpu.utils import lm_perplexity, wer

    platform = jax.devices()[0].platform
    cfg = TransformerConfig(n_layer=4, n_head=4, n_embd=128, dropout=0.0,
                            block_size=128)
    model = create_gpt_quartet(VOCAB, cfg)
    from mop_tpu.utils import jitted_init
    params = jitted_init(model, jax.random.PRNGKey(1),
                         jnp.zeros((1, 8), jnp.int32))
    params, loss = train_lm(model, params)
    print(f"GPT trained: final loss {loss:.3f}", flush=True)

    held = _lm_data(1, batch=64, t=96, seed=999)[0]  # (64, 97)
    tf_ppl, _ = lm_perplexity(model, params, held)
    rows = []
    base = decode_path_ppl(model, params, held)
    for name, p, kvd in (
            ("fp32 KV (decode baseline)", params, jnp.float32),
            ("bf16 KV", params, jnp.bfloat16),
            ("int8 KV", params, jnp.int8),
            ("int8 weights", quantize_params(params), jnp.float32),
            ("int4 weights (g64)", quantize_params(params, bits=4),
             jnp.float32)):
        ppl = decode_path_ppl(model, p, held, kv_dtype=kvd)
        rows.append((name, ppl, ppl - base, (ppl - base) / base * 100))
        print(f"{name}: ppl {ppl:.4f} (Δ {ppl-base:+.4f})", flush=True)

    # ---- Whisper: synthetic mel -> digit-token transcription ----
    from mop_tpu.models import WhisperConfig, create_whisper_mop
    from mop_tpu.models.generate import whisper_transcribe_cached

    wcfg = WhisperConfig(n_mels=16, n_audio_ctx=24, vocab_size=14,
                         n_text_ctx=16, n_embd=64, n_head=4,
                         n_layer_enc=2, n_layer_dec=2, dropout=0.0)
    wmodel = create_whisper_mop(wcfg)
    BOS, L = 11, 8  # tokens 0..9 digits, 11 = BOS

    # Round-5 hardening (VERDICT r4 item 6): the old task (clean 3.0
    # bumps, 0.1 noise) trained to WER 0.0000 at every rung — zero
    # information. Now each digit's bump is CONFUSABLE (a nearly-as-
    # strong bump on the neighboring mel row) under heavy noise, and
    # training is short — the base model sits at a few-percent WER, so
    # the lossy rungs can separate.
    W_NOISE, W_BUMP, W_NEIGHBOR = 0.7, 2.0, 1.2

    def w_batch(n, seed):
        rs = np.random.RandomState(seed)
        digits = rs.randint(0, 10, (n, L))
        mel = rs.randn(n, wcfg.n_audio_ctx, wcfg.n_mels).astype(
            np.float32) * W_NOISE
        for i in range(n):
            for j, d in enumerate(digits[i]):
                mel[i, 3 * j:3 * j + 3, d] += W_BUMP
                mel[i, 3 * j:3 * j + 3, (d + 1) % 10] += W_NEIGHBOR
        dec_in = np.concatenate(
            [np.full((n, 1), BOS), digits], 1).astype(np.int32)
        tgt = np.concatenate(
            [digits, np.full((n, 1), 10)], 1).astype(np.int32)  # 10=EOS
        return (jnp.asarray(mel), jnp.asarray(dec_in), jnp.asarray(tgt),
                digits)

    wparams = wmodel.init(jax.random.PRNGKey(0), *w_batch(2, 0)[:2])
    tx = optax.adamw(1e-3)
    wopt = tx.init(wparams)

    @jax.jit
    def wstep(p, o, mel, dec_in, tgt):
        def lf(p):
            _, loss, _ = wmodel.apply(p, mel, dec_in, targets=tgt,
                                      train=False)
            return loss
        loss, g = jax.value_and_grad(lf)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    for s in range(240):
        mel, dec_in, tgt, _ = w_batch(32, s + 1)
        wparams, wopt, wl = wstep(wparams, wopt, mel, dec_in, tgt)
    print(f"Whisper trained: final loss {float(wl):.3f}", flush=True)

    mel, _, _, digits = w_batch(64, 12345)
    refs = [[int(d) for d in row] for row in digits]

    def w_wer(p, kvd):
        out = whisper_transcribe_cached(wmodel, p, mel, BOS, L + 1,
                                        kv_dtype=kvd)
        hyps = []
        for row in np.asarray(out):
            h = []
            for t in row:
                if t == 10:
                    break
                h.append(int(t))
            hyps.append(h)
        return wer(refs, hyps)

    wrows = []
    wbase = w_wer(wparams, jnp.float32)
    for name, p, kvd in (
            ("fp32 KV (decode baseline)", wparams, jnp.float32),
            ("bf16 KV", wparams, jnp.bfloat16),
            ("int8 KV (per-row scales, self+cross)", wparams, jnp.int8),
            ("int8 weights", quantize_params(wparams), jnp.float32),
            ("int4 weights (g64)", quantize_params(wparams, bits=4),
             jnp.float32)):
        w = w_wer(p, kvd)
        wrows.append((name, w, w - wbase))
        print(f"whisper {name}: WER {w:.4f} (Δ {w-wbase:+.4f})",
              flush=True)

    md = [
        "# Quality ladder: task metrics for the lossy decode modes",
        "",
        f"Platform `{platform}`. Greedy agreement (decode.md / "
        "quant_decode.md) counts token flips; this measures whether the "
        "flips matter on the task metric (VERDICT r3 #7).",
        "",
        "## GPT: held-out perplexity through the decode path",
        "",
        f"4L/128D quartet LM trained to loss {loss:.3f} on the noisy "
        "arithmetic-progression task; 64 held-out 97-token sequences "
        "scored by incremental `decode_step` from an empty cache (the "
        "serving engine's distributions). Teacher-forced fp32 ppl "
        f"{tf_ppl:.4f} (cross-check; decode-path fp32 differs only by "
        "prefix-standardization semantics).",
        "",
        "| mode | ppl | Δppl vs fp32-KV | Δ% |",
        "|---|---|---|---|",
    ]
    for name, ppl, d, pct in rows:
        md.append(f"| {name} | {ppl:.4f} | {d:+.4f} | {pct:+.2f}% |")
    md += [
        "",
        "## Whisper: WER of cached transcription",
        "",
        "2+2-layer WhisperMoP trained on a synthetic mel->digit task "
        f"(final loss {float(wl):.3f}); 64 held-out utterances, greedy "
        "cached decode.",
        "",
        "| mode | WER | ΔWER vs fp32-KV |",
        "|---|---|---|",
    ]
    for name, w, d in wrows:
        md.append(f"| {name} | {w:.4f} | {d:+.4f} |")
    md += [
        "",
        "Reading: bf16 KV's Δ is the rounding of cached K/V rows; int8 "
        "KV adds per-row scale quantization; int8/int4 weights perturb "
        "every matmul. A mode is deployable when its Δ is within the "
        "run-to-run noise of the task — the table gives the number to "
        "compare against a retrain's variance.",
        "",
    ]
    out = os.path.join(REPO, "benchmarks", "quality_ladder.md")
    with open(out, "w") as f:
        f.write("\n".join(md))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
