#!/usr/bin/env python
"""Tiny character-LM training demo: GPT-MoP vs baseline vs Quartet.

The reference ships GPT models + a comparison framework but no training
script (SURVEY §0); this example completes the loop with the mop-tpu
data-parallel LM train step. Uses a synthetic structured character corpus
(zero-egress environment) — loss dropping well below the unigram entropy
demonstrates real sequence learning.

Usage: python examples/train_gpt_char.py [--steps 200] [--model mop]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from mop_tpu.models import (
    TransformerConfig,
    create_gpt_baseline,
    create_gpt_mop,
    create_gpt_quartet,
)
from mop_tpu.parallel import make_lm_train_step, make_mesh, replicate, shard_batch


def synthetic_corpus(n_chars: int = 200_000, seed: int = 0) -> np.ndarray:
    """Markov-ish character stream over a 32-symbol alphabet with strong
    bigram structure plus repeated motifs, so a causal LM has signal."""
    rng = np.random.RandomState(seed)
    v = 32
    trans = rng.dirichlet(np.ones(v) * 0.1, size=v)  # peaky bigram table
    motif = rng.randint(0, v, 12)
    out = np.empty(n_chars, np.int32)
    c = 0
    i = 0
    while i < n_chars:
        if rng.rand() < 0.05 and i + len(motif) < n_chars:
            out[i:i + len(motif)] = motif
            i += len(motif)
            c = motif[-1]
        else:
            c = rng.choice(v, p=trans[c])
            out[i] = c
            i += 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--model", choices=["baseline", "quartet", "mop"],
                    default="mop")
    ap.add_argument("--n_layer", type=int, default=4)
    ap.add_argument("--n_head", type=int, default=4)
    ap.add_argument("--n_embd", type=int, default=128)
    args = ap.parse_args()

    vocab = 32
    cfg = TransformerConfig(
        n_layer=args.n_layer, n_head=args.n_head, n_embd=args.n_embd,
        dropout=0.0, block_size=args.block, bias=False,
    )
    factory = {"baseline": create_gpt_baseline, "quartet": create_gpt_quartet,
               "mop": lambda v, c: create_gpt_mop(v, c, n_views=4, n_kernels=2)}
    model = factory[args.model](vocab, cfg)

    corpus = synthetic_corpus()
    mesh = make_mesh()
    rng = jax.random.PRNGKey(0)
    idx0 = jnp.zeros((args.batch, args.block), jnp.int32)
    params = model.init({"params": rng, "dropout": rng}, idx0, train=True)
    tx = optax.adamw(optax.cosine_decay_schedule(args.lr, args.steps),
                     weight_decay=0.1)
    opt = tx.init(params)
    step = make_lm_train_step(model, tx, mesh, grad_clip=1.0)

    sampler = np.random.RandomState(0)
    with mesh:
        params = replicate(params, mesh)
        opt = replicate(opt, mesh)
        for s in range(1, args.steps + 1):
            starts = sampler.randint(0, len(corpus) - args.block - 1, args.batch)
            xb = np.stack([corpus[i:i + args.block] for i in starts])
            yb = np.stack([corpus[i + 1:i + args.block + 1] for i in starts])
            xb, yb = shard_batch((xb, yb), mesh)
            params, opt, m = step(params, opt, xb, yb, jax.random.fold_in(rng, s))
            if s % 25 == 0 or s == 1:
                print(f"step {s:4d} loss {float(m['loss']):.4f}")

    print(f"\n{args.model}: final loss {float(m['loss']):.4f} "
          f"(uniform={np.log(vocab):.3f})")


if __name__ == "__main__":
    main()
