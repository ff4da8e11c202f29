#!/usr/bin/env python
"""Text generation demo: train a tiny Quartet char-LM, then sample with
both decoders — the exact full-window sampler and the KV-cached mode
(reference has no generation loop at all, SURVEY §0; see
benchmarks/decode.md for the semantics and measured divergence).

Usage: python examples/generate_text.py [--steps 300] [--tokens 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from mop_tpu.models import (TransformerConfig, create_gpt_quartet, generate,
                            generate_cached)

CORPUS = (
    "the quick brown fox jumps over the lazy dog while the cat naps in the "
    "warm sun and the birds sing in the tall green trees by the clear blue "
    "river that flows gently down to the wide open sea "
) * 50


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=64)
    args = ap.parse_args()

    vocab = sorted(set(CORPUS))
    stoi = {c: i for i, c in enumerate(vocab)}
    data = np.asarray([stoi[c] for c in CORPUS], np.int32)
    cfg = TransformerConfig(n_layer=4, n_head=4, n_embd=128, dropout=0.0,
                            block_size=max(128, args.seq + args.tokens))
    model = create_gpt_quartet(len(vocab), cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((2, args.seq), jnp.int32))
    tx = optax.adamw(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, idx, tgt):
        def lf(p):
            _, loss = model.apply(p, idx, targets=tgt, train=False)
            return loss
        loss, g = jax.value_and_grad(lf)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    rs = np.random.RandomState(0)
    for s in range(args.steps):
        starts = rs.randint(0, len(data) - args.seq - 1, args.batch)
        idx = np.stack([data[i:i + args.seq] for i in starts])
        tgt = np.stack([data[i + 1:i + args.seq + 1] for i in starts])
        params, opt, loss = step(params, opt, jnp.asarray(idx),
                                 jnp.asarray(tgt))
        if s % 100 == 0 or s == args.steps - 1:
            print(f"step {s}: loss {float(loss):.3f}")

    prompt_txt = "the quick brown "
    prompt = jnp.asarray([[stoi[c] for c in prompt_txt]], jnp.int32)
    decode = lambda t: "".join(vocab[int(i)] for i in np.asarray(t)[0])

    t0 = time.time()
    full = generate(model, params, prompt, max_new_tokens=args.tokens)
    dt_full = time.time() - t0
    t0 = time.time()
    cached = generate_cached(model, params, prompt,
                             max_new_tokens=args.tokens)
    dt_cached = time.time() - t0
    print(f"\nfull-window ({dt_full:.2f}s): {decode(full)!r}")
    print(f"kv-cached   ({dt_cached:.2f}s): {decode(cached)!r}")


if __name__ == "__main__":
    main()
