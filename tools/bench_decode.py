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

        exact_fn = jax.jit(
            lambda p, pr: generate(model, p, pr, max_new_tokens=new))
        cached_fn = jax.jit(
            lambda p, pr: generate_cached(model, p, pr, max_new_tokens=new))

        out_e, dt_e = timed(exact_fn, params, prompt)
        out_c, dt_c = timed(cached_fn, params, prompt)
        tok_e = B * new / dt_e
        tok_c = B * new / dt_c
        gen_e = np.asarray(out_e[:, T0:])
        gen_c = np.asarray(out_c[:, T0:])
        agree = float(np.mean(gen_e == gen_c))
        first_mismatch = np.argmax(gen_e != gen_c, axis=1).astype(float)
        first_mismatch[np.all(gen_e == gen_c, axis=1)] = new
        rows.append((block, new, tok_e, tok_c, tok_c / tok_e, agree,
                     float(np.median(first_mismatch))))
        print(f"block={block}: exact {tok_e:,.0f} tok/s, cached "
              f"{tok_c:,.0f} tok/s ({tok_c / tok_e:.1f}x), greedy agreement "
              f"{agree:.1%}, median first divergence @{np.median(first_mismatch):.0f}",
              flush=True)

    # Whisper transcription at reference scale (n_audio_ctx=1500).
    from mop_tpu.models import WhisperConfig, create_whisper_mop
    from mop_tpu.models.generate import whisper_transcribe
    from mop_tpu.utils import jitted_init

    wc = WhisperConfig(n_mels=80, n_audio_ctx=1500, vocab_size=512,
                       n_text_ctx=128, n_embd=384, n_head=6,
                       n_layer_enc=4, n_layer_dec=4, dropout=0.0)
    wmodel = create_whisper_mop(wc)
    mel = jax.random.normal(jax.random.PRNGKey(2), (4, 1500, 80))
    ids0 = jnp.zeros((4, 8), jnp.int32)
    wparams = jitted_init(wmodel, jax.random.PRNGKey(3), mel, ids0)
    wt = 64
    wfn = jax.jit(lambda p, m: whisper_transcribe(
        wmodel, p, m, bos_token=1, max_tokens=wt))
    _, dt_w = timed(wfn, wparams, mel)
    wtok = 4 * wt / dt_w
    wframes = 4 * 1500 / dt_w
    print(f"whisper_transcribe: {wtok:,.0f} tok/s "
          f"({wframes:,.0f} audio frames/s), B=4, 1500-frame mel, "
          f"{wt} decode steps", flush=True)

    out = os.path.join(REPO, "benchmarks", "decode.md")
    with open(out, "w") as f:
        f.write("# Decode benchmarks (greedy, batch 8, GPT-quartet "
                "n_embd=384 L=6)\n\n")
        f.write(f"Platform `{platform}` ({jax.devices()[0].device_kind}); "
                "min-of-3 windows, host-transfer barrier.\n\n")
        f.write("| block T | new tokens | exact tok/s | cached tok/s | "
                "speedup | greedy agreement | median 1st divergence |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        for (blk, new, te, tc, sp, ag, fm) in rows:
            f.write(f"| {blk} | {new} | {te:,.0f} | {tc:,.0f} | {sp:.1f}x | "
                    f"{ag:.1%} | {fm:.0f} |\n")
        f.write(f"""
Whisper-MoP transcription (B=4, 1500-frame mel, 64 greedy decode steps,
n_embd=384, 4+4 layers): **{wtok:,.0f} tok/s** ({wframes:,.0f} audio
frames/s consumed).

## Semantics

The reference's attention standardizes each score row over ALL columns
BEFORE the causal mask (`quartet_attn_patch.py:95-98`), so position i's
activations depend on future keys — **no incremental KV cache can be
exact**:

- `generate` (exact mode) re-runs the full (B, block) window every token:
  cost grows O(T^2 d) per token, visible above as the exact-mode tokens/s
  falling with block size. Once the sequence fills the block it is exactly
  the reference's sliding-window semantics.
- `generate_cached` freezes per-layer K/K2/V as tokens land and
  standardizes each new row over the live prefix only: O(T d) per token.
  Its dense prefill is bit-exact vs `model.apply` on the prompt
  (tests/test_generate.py); divergence appears only as frozen cached keys
  drift from what a full re-run would produce — the agreement column
  measures exactly that (random-init weights; trained models, whose
  logit margins are larger, agree longer).

`generate_cached` covers TinyTransformerLM (base + quartet). GPT_MoP's
gate convs are also non-causal (k=3 same-padding over tokens,
`gpt_mop.py:35-47`), which would stack a second approximation — it stays
on the exact sampler.
""")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
