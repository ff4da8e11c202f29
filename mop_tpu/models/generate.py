"""Autoregressive generation for the GPT family.

The reference computes logits+loss only — no generation loop exists
(SURVEY §0, reference ``mop/models/gpt_mop.py:181-207``). This module adds a
jittable sampler: fixed-size context window (static shapes, ``lax.scan`` over
decode steps), greedy or temperature/top-k sampling. Works with
TinyTransformerLM, GPT_MoP, or any model whose ``apply`` returns
``(logits, loss)`` for an int token batch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def generate(
    model,
    params,
    prompt: Array,
    max_new_tokens: int,
    rng: Optional[Array] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
) -> Array:
    """Generate ``max_new_tokens`` continuations for a (B, T0) prompt.

    Greedy when ``temperature == 0`` or no rng given. The context is a fixed
    (B, block_size) ring: static shapes throughout, so the whole loop jits as
    one ``lax.scan``. Returns (B, T0 + max_new_tokens).

    Design note (why no KV cache): the reference's attention standardizes
    each score row over ALL columns BEFORE the causal mask
    (``quartet_attn_patch.py:95-98``), so a row's statistics depend on the
    not-yet-generated positions' keys, which themselves shift whenever a new
    token lands. Any incremental cache is therefore approximate by
    construction; this full-window scan is the exact semantics.
    """
    block = model.config.block_size
    b, t0 = prompt.shape
    assert t0 >= 1
    greedy = rng is None or temperature == 0.0
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # Fixed window holding the most recent `block` tokens, plus a length.
    window = jnp.zeros((b, block), jnp.int32)
    window = jax.lax.dynamic_update_slice(
        window, prompt[:, -block:].astype(jnp.int32), (0, 0))
    cur_len = min(t0, block)

    def step(carry, _):
        window, length, rng = carry
        logits, _ = model.apply(params, window, train=False)
        # Logits at the last valid position (same position for every row).
        last = jax.lax.dynamic_index_in_dim(
            logits, length - 1, axis=1, keepdims=False)  # (B, vocab)
        if greedy:
            nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
        else:
            scaled = last / jnp.maximum(temperature, 1e-6)
            if top_k is not None:
                kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
                scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, scaled).astype(jnp.int32)

        # Append: shift left if the window is full, else write at `length`.
        full = length >= block
        shifted = jnp.where(full, jnp.roll(window, -1, axis=1), window)
        write_at = jnp.where(full, block - 1, length)
        onehot = (jnp.arange(block) == write_at).astype(window.dtype)
        new_window = shifted * (1 - onehot)[None, :] + nxt[:, None] * onehot[None, :]
        new_len = jnp.minimum(length + 1, block)
        return (new_window, new_len, rng), nxt

    length0 = jnp.asarray(cur_len, jnp.int32)
    (_, _, _), toks = jax.lax.scan(
        step, (window, length0, rng), None, length=max_new_tokens)
    return jnp.concatenate([prompt.astype(jnp.int32), toks.T], axis=1)


def whisper_transcribe(
    model,
    params,
    mel: Array,
    bos_token: int,
    max_tokens: int,
) -> Array:
    """Greedy transcription for WhisperMoP: encode once, decode step by step.

    Returns (B, max_tokens) token ids. Fixed-size decoder window (static
    shapes, one ``lax.scan``); the encoder runs once. The reference has no
    decode loop (its WhisperMoP only computes teacher-forced logits).
    """
    enc_out, _ = model.apply(params, mel, method=model.encode)
    b = mel.shape[0]
    win = max_tokens + 1

    def step(carry, i):
        tokens = carry  # (B, win) with tokens[:, 0] = BOS
        logits = model.apply(params, enc_out, tokens, method=model.decode)
        last = jax.lax.dynamic_index_in_dim(logits, i, axis=1, keepdims=False)
        nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
        onehot = (jnp.arange(win) == (i + 1)).astype(tokens.dtype)
        tokens = tokens * (1 - onehot)[None, :] + nxt[:, None] * onehot[None, :]
        return tokens, nxt

    tokens0 = jnp.zeros((b, win), jnp.int32).at[:, 0].set(bos_token)
    _, outs = jax.lax.scan(step, tokens0, jnp.arange(max_tokens))
    return outs.T  # (B, max_tokens)
