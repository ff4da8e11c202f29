"""Beam-search decoding over the KV cache for the GPT family.

Beyond-reference capability (the reference computes logits+loss only,
``mop/models/gpt_mop.py:181-207`` — no decode loop of any kind). TPU-native
design: beams are batch rows (B·K), each step is one cached
:func:`~mop_tpu.models.generate.decode_step` over all beams at once plus a
top-k over K·V candidates, and beam reordering is a batched gather on the
KV cache — all static shapes, the whole search compiles as one
``lax.scan``.

Scoring: cumulative token log-probability; finished beams (emitted
``eos_id``) are frozen — their single candidate continuation is an
``eos_id`` pad with score delta 0, so they compete unchanged against live
expansions (the standard "finished beams ride along" formulation). Final
ranking divides by ``length^length_penalty`` (generated length, EOS
included; ``length_penalty=0`` ranks by raw cumulative log-prob).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .generate import (decode_step, prefill, whisper_decode_prep,
                       whisper_decode_token)

Array = jax.Array


def _beam_select(scores: Array, logp: Array, alive: Array, pad_tok: int):
    """One beam-search selection: expand (B, K) beams by (B, K, V)
    log-probs and keep the top K. Finished beams contribute exactly one
    candidate (``pad_tok`` at score delta 0). Returns
    (new_scores (B, K), parent (B, K), tok_new (B, K))."""
    b, k, v = logp.shape
    fin = jnp.full((v,), -jnp.inf).at[pad_tok].set(0.0)
    delta = jnp.where(alive[:, :, None], logp, fin[None, None, :])
    cand = (scores[:, :, None] + delta).reshape(b, k * v)
    new_scores, flat = jax.lax.top_k(cand, k)
    return new_scores, flat // v, (flat % v).astype(jnp.int32)


def _repeat_cache(cache: dict, k: int) -> dict:
    """Broadcast a B-row KV cache to B·K rows (beam-major: row b·K+j is
    beam j of batch b). Repeats every buffer along its batch axis (axis 1
    of the (L, B, H, T, dk) rows and (L, B, H, T) int8 scales)."""
    out = {}
    for key, v in cache.items():
        out[key] = v if key == "len" else jnp.repeat(v, k, axis=1)
    return out


def _gather_cache(cache: dict, rows: Array) -> dict:
    """Reorder the B·K cache rows by ``rows`` (flat parent indices)."""
    out = {}
    for key, v in cache.items():
        out[key] = v if key == "len" else jnp.take(v, rows, axis=1)
    return out


def generate_beam(
    model,
    params,
    prompt: Array,
    max_new_tokens: int,
    num_beams: int = 4,
    length_penalty: float = 1.0,
    eos_id: Optional[int] = None,
    kv_dtype=jnp.float32,
    return_all: bool = False,
):
    """Beam search for a (B, T0) prompt; returns the best continuation
    (B, T0 + max_new_tokens), or with ``return_all=True`` a tuple of all
    beams (B, K, T0 + max_new_tokens) and their final scores (B, K), both
    sorted best-first per batch row.

    ``num_beams=1`` reduces exactly to greedy ``generate_cached``; with
    ``num_beams >= V^(n-1)`` the search is exhaustive over n steps (used by
    the oracle test). Positions after an emitted ``eos_id`` are padded with
    ``eos_id``. Uses the same approximate-KV semantics as the other cached
    decoders (prefix row standardization; see generate.py's module note).

    Cost note: each step re-gathers the full (L, B·K, H, block, dk) cache
    by parent beam — O(beams · cache bytes) of HBM traffic per token. For
    long blocks prefer modest K; a paged/block-table variant would make the
    gather O(1) but is not needed at reference scales.
    """
    cfg = model.config
    b, t0 = prompt.shape
    k = int(num_beams)
    vmax = model.vocab_size
    if k < 1:
        raise ValueError(f"num_beams must be >= 1, got {num_beams}")
    if k > vmax:
        raise ValueError(
            f"num_beams {k} exceeds vocab_size {vmax}: step 0 has only "
            f"vocab_size distinct continuations")
    if t0 + max_new_tokens > cfg.block_size:
        raise ValueError(
            f"generate_beam: t0 + max_new_tokens = {t0 + max_new_tokens} "
            f"exceeds block_size {cfg.block_size}")
    pad_tok = 0 if eos_id is None else int(eos_id)

    logits0, cache = prefill(model, params, prompt.astype(jnp.int32),
                             kv_dtype=kv_dtype)
    logp0 = jax.nn.log_softmax(logits0, -1)              # (B, V)
    scores, tok0 = jax.lax.top_k(logp0, k)               # (B, K)
    tok0 = tok0.astype(jnp.int32)
    cache = _repeat_cache(cache, k)

    alive = jnp.ones((b, k), bool) if eos_id is None \
        else tok0 != eos_id
    lengths = jnp.ones((b, k), jnp.int32)
    buf = jnp.full((b, k, max_new_tokens), pad_tok, jnp.int32)
    buf = buf.at[:, :, 0].set(tok0)

    batch_off = (jnp.arange(b) * k)[:, None]              # (B, 1)
    rows = jnp.arange(b)[:, None]                         # (B, 1)

    def step(carry, i):
        tok, cache, scores, alive, lengths, buf = carry
        logits, cache = decode_step(model, params, cache,
                                    tok.reshape(b * k))
        logp = jax.nn.log_softmax(logits, -1).reshape(b, k, -1)
        new_scores, parent, tok_new = _beam_select(scores, logp, alive,
                                                   pad_tok)
        parent_rows = (batch_off + parent).reshape(b * k)
        cache = _gather_cache(cache, parent_rows)
        p_alive = alive[rows, parent]
        p_len = lengths[rows, parent]
        buf = buf[rows, parent]                           # (B, K, max_new)
        buf = buf.at[:, :, i].set(jnp.where(p_alive, tok_new, pad_tok))
        new_alive = p_alive if eos_id is None \
            else p_alive & (tok_new != eos_id)
        new_len = p_len + p_alive.astype(jnp.int32)
        return (tok_new, cache, new_scores, new_alive, new_len, buf), None

    carry = (tok0, cache, scores, alive, lengths, buf)
    if max_new_tokens > 1:
        carry, _ = jax.lax.scan(step, carry,
                                jnp.arange(1, max_new_tokens))
    _, _, scores, alive, lengths, buf = carry

    norm = jnp.maximum(lengths.astype(jnp.float32), 1.0) ** length_penalty
    final = scores / norm                                  # (B, K)
    order = jnp.argsort(-final, axis=-1)                   # best first
    seqs = jnp.concatenate(
        [jnp.broadcast_to(prompt.astype(jnp.int32)[:, None, :],
                          (b, k, t0)), buf], axis=-1)
    seqs = seqs[rows, order]
    final = final[rows, order]
    if return_all:
        return seqs, final
    return seqs[:, 0]


def whisper_transcribe_beam(
    model,
    params,
    mel: Array,
    bos_token: int,
    max_tokens: int,
    num_beams: int = 4,
    length_penalty: float = 1.0,
    eos_id: Optional[int] = None,
    kv_dtype=jnp.float32,
    return_all: bool = False,
):
    """Beam-search transcription for WhisperMoP (B, T, n_mels) mel input.

    Returns the best (B, max_tokens) token stream, or with
    ``return_all=True`` all beams (B, K, max_tokens) + final scores (B, K),
    sorted best-first. EXACT beam search (the Whisper decoder's KV cache is
    exact — see generate.py's cached-Whisper note): ``num_beams=1`` equals
    greedy ``whisper_transcribe_cached`` bit-for-bit. Encoder runs once;
    cross-attention K/V are computed per batch row and repeated across
    beams (beam reordering never has to gather them — beams of a batch row
    share the same memory); self-attention caches are gathered by parent
    beam per step like :func:`generate_beam`."""
    cfg = model.cfg
    vmax = cfg.vocab_size
    b = mel.shape[0]
    k = int(num_beams)
    if k < 1:
        raise ValueError(f"num_beams must be >= 1, got {num_beams}")
    if k > vmax:
        raise ValueError(
            f"num_beams {k} exceeds vocab_size {vmax}: step 0 has only "
            f"vocab_size distinct continuations")
    pad_tok = 0 if eos_id is None else int(eos_id)

    p, cfg, cross_k, cross_v = whisper_decode_prep(model, params, mel,
                                                   kv_dtype)
    h = cfg.n_head
    dh = cfg.n_embd // h
    L = cfg.n_layer_dec
    win = max_tokens + 1
    ks = jnp.zeros((L, b, h, win, dh), kv_dtype)
    vs = jnp.zeros((L, b, h, win, dh), kv_dtype)

    # BOS step on B rows, then fan out to B*K beams.
    bos = jnp.full((b,), bos_token, jnp.int32)
    logits0, ks, vs = whisper_decode_token(p, cfg, bos, 0, ks, vs,
                                           cross_k, cross_v)
    scores, tok0 = jax.lax.top_k(jax.nn.log_softmax(logits0, -1), k)
    tok0 = tok0.astype(jnp.int32)
    rep = lambda x: jnp.repeat(x, k, axis=1)
    ks, vs = rep(ks), rep(vs)
    cross_k, cross_v = rep(cross_k), rep(cross_v)

    alive = jnp.ones((b, k), bool) if eos_id is None else tok0 != eos_id
    lengths = jnp.ones((b, k), jnp.int32)
    buf = jnp.full((b, k, max_tokens), pad_tok, jnp.int32)
    buf = buf.at[:, :, 0].set(tok0)
    batch_off = (jnp.arange(b) * k)[:, None]
    rows = jnp.arange(b)[:, None]

    def step(carry, i):
        tok, ks, vs, scores, alive, lengths, buf = carry
        logits, ks, vs = whisper_decode_token(
            p, cfg, tok.reshape(b * k), i, ks, vs, cross_k, cross_v)
        logp = jax.nn.log_softmax(logits, -1).reshape(b, k, -1)
        new_scores, parent, tok_new = _beam_select(scores, logp, alive,
                                                   pad_tok)
        parent_rows = (batch_off + parent).reshape(b * k)
        ks = jnp.take(ks, parent_rows, axis=1)
        vs = jnp.take(vs, parent_rows, axis=1)
        p_alive = alive[rows, parent]
        p_len = lengths[rows, parent]
        buf2 = buf[rows, parent]
        buf2 = buf2.at[:, :, i].set(jnp.where(p_alive, tok_new, pad_tok))
        new_alive = p_alive if eos_id is None \
            else p_alive & (tok_new != eos_id)
        new_len = p_len + p_alive.astype(jnp.int32)
        return (tok_new, ks, vs, new_scores, new_alive, new_len,
                buf2), None

    carry = (tok0, ks, vs, scores, alive, lengths, buf)
    if max_tokens > 1:
        carry, _ = jax.lax.scan(step, carry, jnp.arange(1, max_tokens))
    _, _, _, scores, alive, lengths, buf = carry

    norm = jnp.maximum(lengths.astype(jnp.float32), 1.0) ** length_penalty
    final = scores / norm
    order = jnp.argsort(-final, axis=-1)
    buf = buf[rows, order]
    final = final[rows, order]
    if return_all:
        return buf, final
    return buf[:, 0]
