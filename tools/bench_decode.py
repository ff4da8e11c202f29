"""Decode benchmark: tokens/s vs sequence length on the real chip
(VERDICT r2 #7 — generate()/whisper_transcribe() had no perf story).

Measures, min-of-3 windows with host-transfer barriers (block_until_ready
does not synchronize on the axon tunnel):

- the EXACT full-window sampler (``generate``): re-runs the (B, block)
  window per token — O(T^2 d)/token, the cost of the reference's pre-mask
  row standardization (no exact incremental cache exists);
- the flag-style APPROXIMATE KV-cache sampler (``generate_cached``):
  per-layer K/K2/V caches + prefix standardization — O(T d)/token — with
  its measured greedy-token divergence from the exact sampler;
- ``whisper_transcribe`` at the reference's n_audio_ctx scale.

Writes benchmarks/decode.md.  Run:  python tools/bench_decode.py
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


def timed(fn, *args, windows=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a), out)  # warmup + barrier
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def generate_prefix_exact(model, params, prompt, max_new_tokens):
    """The TRUE reference semantics: greedy decode applying the model to the
    growing prefix (length t) each step — standardization over exactly the
    t live columns. One jit compile per length (bench-only oracle)."""
    toks = jnp.asarray(prompt, jnp.int32)
    for _ in range(max_new_tokens):
        logits, _ = jax.jit(
            lambda p, t: model.apply(p, t, train=False))(params, toks)
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        toks = jnp.concatenate([toks, nxt[:, None]], axis=1)
    return toks


def train_briefly(model, params, rng, vocab, steps=150, batch=32, t=64):
    """A few hundred steps on a noisy arithmetic-progression task so logit
    margins are real — random-init argmax flips on 1e-3 noise, which would
    make any sampler-agreement number meaningless."""
    import optax

    rs = np.random.RandomState(0)
    start = rs.randint(0, vocab, (steps, batch, 1))
    stride = rs.randint(1, 6, (steps, batch, 1))
    ids = (start + stride * np.arange(t + 1)) % vocab
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


def main():
    from mop_tpu.models import (TransformerConfig, create_gpt_quartet,
                                generate, generate_cached)

    platform = jax.devices()[0].platform
    rows = []
    B, T0 = 8, 16
    vocab = 512
    for block in (128, 256, 512):
        cfg = TransformerConfig(n_layer=6, n_head=6, n_embd=384, dropout=0.0,
                                block_size=block)
        model = create_gpt_quartet(vocab, cfg)
        rng = jax.random.PRNGKey(0)
        prompt = jax.random.randint(rng, (B, T0), 0, vocab)
        from mop_tpu.utils import jitted_init

        params = jitted_init(model, jax.random.PRNGKey(1), prompt)
        new = block - T0

        from mop_tpu.ops.quant import quantize_params

        exact_fn = jax.jit(
            lambda p, pr: generate(model, p, pr, max_new_tokens=new))
        cached_fn = jax.jit(
            lambda p, pr: generate_cached(model, p, pr, max_new_tokens=new))
        cached16_fn = jax.jit(
            lambda p, pr: generate_cached(model, p, pr, max_new_tokens=new,
                                          kv_dtype=jnp.bfloat16))

        out_e, dt_e = timed(exact_fn, params, prompt)
        out_c, dt_c = timed(cached_fn, params, prompt)
        out_c16, dt_c16 = timed(cached16_fn, params, prompt)
        qparams = quantize_params(params)
        out_q, dt_q = timed(cached_fn, qparams, prompt)
        q4params = quantize_params(params, bits=4)
        out_q4, dt_q4 = timed(cached_fn, q4params, prompt)
        tok_e = B * new / dt_e
        tok_c = B * new / dt_c
        tok_c16 = B * new / dt_c16
        tok_q = B * new / dt_q
        tok_q4 = B * new / dt_q4
        rows.append((block, new, tok_e, tok_c, tok_c / tok_e, tok_c16,
                     tok_c16 / tok_c, tok_q, tok_q / tok_c, tok_q4,
                     tok_q4 / tok_c))
        print(f"block={block}: full-window {tok_e:,.0f} tok/s, cached "
              f"{tok_c:,.0f} tok/s ({tok_c / tok_e:.1f}x), bf16-KV "
              f"{tok_c16:,.0f} tok/s ({tok_c16 / tok_c:.2f}x vs cached), "
              f"int8 cached "
              f"{tok_q:,.0f} tok/s ({tok_q / tok_c:.2f}x vs cached), int4 "
              f"{tok_q4:,.0f} tok/s ({tok_q4 / tok_c:.2f}x vs cached)",
              flush=True)

    # ---- divergence protocol: briefly-trained model, judged against the
    # prefix-exact oracle (apply to the growing prefix each step — the true
    # reference semantics). Both production samplers are approximations in
    # different ways: generate() pads the window to `block` (stats include
    # pad columns until the window fills), generate_cached() freezes
    # prefix K/V.
    cfg = TransformerConfig(n_layer=4, n_head=4, n_embd=128, dropout=0.0,
                            block_size=128)
    model = create_gpt_quartet(vocab, cfg)
    rng = jax.random.PRNGKey(0)
    from mop_tpu.utils import jitted_init

    p0 = jitted_init(model, jax.random.PRNGKey(1),
                     jnp.zeros((2, 64), jnp.int32))
    params, final_loss = train_briefly(model, p0, rng, vocab)
    t0d, newd = 96, 32
    rs = np.random.RandomState(7)
    start = rs.randint(0, vocab, (B, 1))
    stride = rs.randint(1, 6, (B, 1))
    promptd = jnp.asarray((start + stride * np.arange(t0d)) % vocab,
                          jnp.int32)
    oracle = np.asarray(
        generate_prefix_exact(model, params, promptd, newd)[:, t0d:])
    full = np.asarray(generate(model, params, promptd, newd)[:, t0d:])
    cach = np.asarray(generate_cached(model, params, promptd, newd)[:, t0d:])
    cach16 = np.asarray(generate_cached(
        model, params, promptd, newd, kv_dtype=jnp.bfloat16)[:, t0d:])
    from mop_tpu.ops.quant import quantize_params

    quant = np.asarray(generate_cached(
        model, quantize_params(params, min_size=0), promptd,
        newd)[:, t0d:])
    quant4 = np.asarray(generate_cached(
        model, quantize_params(params, min_size=0, bits=4), promptd,
        newd)[:, t0d:])
    ag_full = float(np.mean(full == oracle))
    ag_cach = float(np.mean(cach == oracle))
    ag_cach16 = float(np.mean(cach16 == oracle))
    ag_quant = float(np.mean(quant == oracle))
    ag_quant4 = float(np.mean(quant4 == oracle))
    print(f"divergence vs prefix-exact oracle (trained model, loss "
          f"{final_loss:.3f}, {newd} greedy tokens): full-window "
          f"{ag_full:.1%}, cached {ag_cach:.1%}, bf16-KV cached "
          f"{ag_cach16:.1%}, int8 cached "
          f"{ag_quant:.1%}, int4 cached {ag_quant4:.1%}", flush=True)

    # Whisper transcription at reference scale (n_audio_ctx=1500).
    from mop_tpu.models import WhisperConfig, create_whisper_mop
    from mop_tpu.models.generate import whisper_transcribe
    from mop_tpu.utils import jitted_init

    from mop_tpu.models.generate import whisper_transcribe_cached

    wrows = []
    # (n_text_ctx, decode steps): the short context the repo tests use, and
    # the real Whisper text context (reference whisper.cpp-style 448) where
    # the O(T^2) window recompute actually bites.
    for wctx, wt in ((128, 64), (448, 400)):
        wc = WhisperConfig(n_mels=80, n_audio_ctx=1500, vocab_size=512,
                           n_text_ctx=wctx, n_embd=384, n_head=6,
                           n_layer_enc=4, n_layer_dec=4, dropout=0.0)
        wmodel = create_whisper_mop(wc)
        mel = jax.random.normal(jax.random.PRNGKey(2), (4, 1500, 80))
        ids0 = jnp.zeros((4, 8), jnp.int32)
        wparams = jitted_init(wmodel, jax.random.PRNGKey(3), mel, ids0)
        wfn = jax.jit(lambda p, m, wmodel=wmodel, wt=wt: whisper_transcribe(
            wmodel, p, m, bos_token=1, max_tokens=wt))
        out_u, dt_w = timed(wfn, wparams, mel)
        wfn_c = jax.jit(
            lambda p, m, wmodel=wmodel, wt=wt: whisper_transcribe_cached(
                wmodel, p, m, bos_token=1, max_tokens=wt))
        out_c, dt_wc = timed(wfn_c, wparams, mel)
        agree_w = float(np.mean(np.asarray(out_c) == np.asarray(out_u)))
        wrows.append((wctx, wt, 4 * wt / dt_w, 4 * 1500 / dt_w,
                      4 * wt / dt_wc, dt_w / dt_wc, agree_w))
        print(f"whisper ctx={wctx}: full-window {4 * wt / dt_w:,.0f} tok/s, "
              f"cached {4 * wt / dt_wc:,.0f} tok/s ({dt_w / dt_wc:.1f}x), "
              f"greedy-token agreement {agree_w:.1%}", flush=True)

    out = os.path.join(REPO, "benchmarks", "decode.md")
    with open(out, "w") as f:
        f.write("# Decode benchmarks (greedy, batch 8, GPT-quartet "
                "n_embd=384 L=6)\n\n")
        f.write(f"Platform `{platform}` ({jax.devices()[0].device_kind}); "
                "min-of-3 windows, host-transfer barrier.\n\n")
        f.write("| block T | new tokens | full-window tok/s | cached tok/s | "
                "speedup | bf16-KV tok/s | vs cached | int8 tok/s | vs "
                "cached | int4 tok/s | vs cached |\n")
        f.write("|---|---|---|---|---|---|---|---|---|---|---|\n")
        for (blk, new, te, tc, sp, tc16, sp16, tq, spq, tq4, spq4) in rows:
            f.write(f"| {blk} | {new} | {te:,.0f} | {tc:,.0f} | {sp:.1f}x "
                    f"| {tc16:,.0f} | {sp16:.2f}x "
                    f"| {tq:,.0f} | {spq:.2f}x | {tq4:,.0f} | {spq4:.2f}x "
                    f"|\n")
        f.write(
            "\nint8/int4 LOSE at this 11M-param batch-8 shape: the step is "
            "not weight-HBM-bound, so dequant overhead beats the saved "
            "reads. The regime quantization exists for (170M params, batch "
            "1) is measured in benchmarks/quant_decode.md.\n")
        f.write("""
## Whisper-MoP transcription (B=4, 1500-frame mel, n_embd=384, 4+4 layers)

| text ctx | decode steps | full-window tok/s | cached tok/s | speedup | greedy agreement |
|---|---|---|---|---|---|
""")
        for (wctx, wt, wtok, wframes, wtok_c, wsp, agree_w) in wrows:
            f.write(f"| {wctx} | {wt} | {wtok:,.0f} | {wtok_c:,.0f} | "
                    f"{wsp:.1f}x | {agree_w:.1%} |\n")
        f.write(f"""
Unlike the GPT family the Whisper decoder is a standard causal
transformer, so the KV cache is mathematically exact
(tests/test_generate.py pins token equality); the bench checkpoint is
untrained, so its greedy argmax margins sit at the fp noise floor and
reduction-order differences flip some ties — the agreement column is a
sanity bound, not an exactness measure. The cache only pays once the
window recompute is expensive: at the repo-test 128-token context the
sequential cached loop's per-step latency competes with recomputing the
tiny window; the real Whisper 448-token context measures
{wrows[-1][5]:.1f}x.

## Divergence vs the prefix-exact oracle

The reference's attention standardizes each score row over ALL columns
BEFORE the causal mask (`quartet_attn_patch.py:95-98`), so position i's
activations depend on future keys — **no incremental KV cache can be
exact**, and even the full-window sampler deviates while the window is
part-padded. Protocol: train the quartet LM briefly (so argmax margins are
real — final loss {final_loss:.3f}), decode {newd} greedy tokens from a
{t0d}-token prompt, judge each production sampler against the oracle that
re-applies the model to the *growing prefix* every step (one compile per
length; bench-only):

| sampler | cost/token | token agreement vs oracle |
|---|---|---|
| `generate` (full {cfg.block_size}-window) | O(T^2 d) | {ag_full:.1%} |
| `generate_cached` (prefix KV cache) | O(T d) | {ag_cach:.1%} |
| `generate_cached` + bf16 KV storage | O(T d), 2x less KV HBM | {ag_cach16:.1%} |
| `generate_cached` + int8 weights | O(T d), 4x less weight HBM | {ag_quant:.1%} |
| `generate_cached` + int4 weights (group 64) | O(T d), 8x less weight HBM | {ag_quant4:.1%} |

`generate`'s window pads to `block`, so its row statistics include pad
columns until the sequence fills the window (exact only from that point
on); `generate_cached`'s prefill is bit-exact on the prompt
(tests/test_generate.py) and each new row standardizes over the live
prefix, with frozen cached K/V as its only approximation.

`generate_cached` covers TinyTransformerLM (base + quartet). GPT_MoP's
gate convs are also non-causal (k=3 same-padding over tokens,
`gpt_mop.py:35-47`), which would stack a second approximation — it stays
on the full-window sampler.
""")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
