#!/usr/bin/env python
"""Whisper-MoP demo: raw audio -> on-device log-mel -> encoder-decoder.

Exercises the full audio path the reference leaves to external tooling
(its WhisperMoP consumes precomputed mel, ``mop/models/whisper_mop.py:352``):
here the log-mel frontend is an XLA op (``mop_tpu.ops.mel``). Synthetic tone
sequences map deterministically to token targets so a few training steps show
the loss dropping.

Usage: python examples/whisper_demo.py [--steps 30]
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

from mop_tpu.models import WhisperConfig, create_whisper_mop
from mop_tpu.ops.mel import log_mel_spectrogram


def tone_dataset(n: int, seconds: float = 0.5, sr: int = 16_000, seed: int = 0):
    """Each sample: 4 sequential tones from an 8-note scale; the target token
    sequence is the note ids (a toy transcription task)."""
    rng = np.random.RandomState(seed)
    notes = 220.0 * 2 ** (np.arange(8) / 8.0)
    t = np.arange(int(seconds * sr)) / sr
    seg = len(t) // 4
    audio = np.zeros((n, len(t)), np.float32)
    tokens = rng.randint(0, 8, (n, 4))
    for i in range(n):
        for j in range(4):
            f = notes[tokens[i, j]]
            audio[i, j * seg:(j + 1) * seg] = 0.5 * np.sin(
                2 * np.pi * f * t[:seg])
    return audio, tokens.astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    sr, seconds = 16_000, 0.5
    audio, tokens = tone_dataset(256, seconds, sr)
    n_frames = 1 + int(seconds * sr) // 160

    vocab = 16  # 8 notes + BOS and padding room
    bos = 8
    cfg = WhisperConfig(
        n_mels=80, n_audio_ctx=n_frames, vocab_size=vocab, n_text_ctx=8,
        n_embd=64, n_head=4, n_layer_enc=2, n_layer_dec=2, dropout=0.0,
        bias=False, n_views=3, n_kernels=2, kernel_size=3,
    )
    model = create_whisper_mop(cfg)

    rng = jax.random.PRNGKey(0)
    mel0 = jnp.zeros((args.batch, n_frames, cfg.n_mels))
    ids0 = jnp.zeros((args.batch, 5), jnp.int32)
    params = model.init(rng, mel0, ids0)
    tx = optax.adamw(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, wav, tgt):
        mel = log_mel_spectrogram(wav, sr)  # on-device frontend
        dec_in = jnp.concatenate(
            [jnp.full((tgt.shape[0], 1), bos, jnp.int32), tgt[:, :-1]], axis=1)
        def lf(p):
            _, loss, _ = model.apply(p, mel, dec_in, targets=tgt)
            return loss
        loss, g = jax.value_and_grad(lf)(params)
        u, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt2, loss

    sampler = np.random.RandomState(0)
    for s in range(1, args.steps + 1):
        sel = sampler.randint(0, len(audio), args.batch)
        params, opt, loss = step(params, opt, jnp.asarray(audio[sel]),
                                 jnp.asarray(tokens[sel]))
        if s % 5 == 0 or s == 1:
            print(f"step {s:3d} loss {float(loss):.4f}")
    print(f"\nfinal loss {float(loss):.4f} (uniform={np.log(vocab):.3f})")


if __name__ == "__main__":
    main()
