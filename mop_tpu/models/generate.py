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

from .layers import gelu_tanh

Array = jax.Array


def _top_p_mask(scaled: Array, top_p: float) -> Array:
    """Nucleus filter: keep the smallest set of tokens whose probability
    mass reaches ``top_p`` (the top token is always kept), -inf the rest.
    ``scaled``: (B, vocab) temperature-scaled logits."""
    srt = jnp.sort(scaled, -1)[:, ::-1]  # descending
    probs = jax.nn.softmax(srt, -1)
    cum = jnp.cumsum(probs, -1)
    keep = (cum - probs) < top_p  # keep while mass BEFORE this token < p
    thr = jnp.min(jnp.where(keep, srt, jnp.inf), -1, keepdims=True)
    return jnp.where(scaled >= thr, scaled, -jnp.inf)


def _min_p_mask(scaled: Array, min_p: float) -> Array:
    """min-p filter: keep tokens whose probability is at least
    ``min_p * max_prob``. In logit space that is exactly
    ``logit >= max_logit + log(min_p)`` (softmax is shift-invariant), so no
    softmax materializes. ``scaled``: (B, vocab) temperature-scaled logits."""
    thr = jnp.max(scaled, -1, keepdims=True) + jnp.log(min_p)
    return jnp.where(scaled >= thr, scaled, -jnp.inf)


def _apply_penalties(logits: Array, out_counts: Array, seen: Array,
                     repetition_penalty, presence_penalty,
                     frequency_penalty) -> Array:
    """Repetition/presence/frequency penalties on raw (B, vocab) logits.

    Follows the vLLM convention: ``repetition_penalty`` (CTRL-style —
    positive logits divided by r, negative multiplied) considers tokens seen
    in the PROMPT OR the output (``seen``: (B, vocab) bool); presence and
    frequency penalties (OpenAI-style additive) consider OUTPUT token counts
    only (``out_counts``: (B, vocab) int)."""
    if repetition_penalty is not None and repetition_penalty != 1.0:
        r = jnp.float32(repetition_penalty)
        penalized = jnp.where(logits > 0, logits / r, logits * r)
        logits = jnp.where(seen, penalized, logits)
    if presence_penalty is not None and presence_penalty != 0.0:
        logits = logits - presence_penalty * (out_counts > 0)
    if frequency_penalty is not None and frequency_penalty != 0.0:
        logits = logits - frequency_penalty * out_counts
    return logits


def generate(
    model,
    params,
    prompt: Array,
    max_new_tokens: int,
    rng: Optional[Array] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    min_p: Optional[float] = None,
    repetition_penalty: Optional[float] = None,
    presence_penalty: Optional[float] = None,
    frequency_penalty: Optional[float] = None,
) -> Array:
    """Generate ``max_new_tokens`` continuations for a (B, T0) prompt.

    Greedy when ``temperature == 0`` or no rng given (penalties still apply
    under greedy; see :func:`_apply_penalties` for the min-p / penalty
    conventions). The context is a fixed (B, block_size) ring: static shapes
    throughout, so the whole loop jits as one ``lax.scan``. Returns
    (B, T0 + max_new_tokens).

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

    pick = _make_pick(greedy, temperature, top_k, top_p, min_p,
                      repetition_penalty, presence_penalty,
                      frequency_penalty)
    if pick.uses_counts:
        pcounts = _prompt_counts(prompt.astype(jnp.int32), model.vocab_size)
        ocounts0 = jnp.zeros_like(pcounts)
    else:
        pcounts = jnp.zeros((b, 1), jnp.int32)
        ocounts0 = pcounts

    # Fixed window holding the most recent `block` tokens, plus a length.
    window = jnp.zeros((b, block), jnp.int32)
    window = jax.lax.dynamic_update_slice(
        window, prompt[:, -block:].astype(jnp.int32), (0, 0))
    cur_len = min(t0, block)

    def step(carry, _):
        window, length, rng, oc = carry
        logits, _ = model.apply(params, window, train=False)
        # Logits at the last valid position (same position for every row).
        last = jax.lax.dynamic_index_in_dim(
            logits, length - 1, axis=1, keepdims=False)  # (B, vocab)
        nxt, rng = pick(last, rng, oc, pcounts)
        if pick.uses_counts:
            oc = oc.at[jnp.arange(b), nxt].add(1)

        # Append: shift left if the window is full, else write at `length`.
        full = length >= block
        shifted = jnp.where(full, jnp.roll(window, -1, axis=1), window)
        write_at = jnp.where(full, block - 1, length)
        onehot = (jnp.arange(block) == write_at).astype(window.dtype)
        new_window = shifted * (1 - onehot)[None, :] + nxt[:, None] * onehot[None, :]
        new_len = jnp.minimum(length + 1, block)
        return (new_window, new_len, rng, oc), nxt

    length0 = jnp.asarray(cur_len, jnp.int32)
    (_, _, _, _), toks = jax.lax.scan(
        step, (window, length0, rng, ocounts0), None, length=max_new_tokens)
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


# ------------------------- cached (approximate) decode -------------------------
#
# The exact sampler above re-runs the full window per token (O(T^2 d) per
# token) because the reference's attention standardizes each score row over
# ALL columns BEFORE the causal mask (``quartet_attn_patch.py:95-98``) —
# position i's activations depend on future keys, so no incremental cache
# can be exact. ``generate_cached`` is the flag-gated approximation: per-
# layer K/K2/V ring caches, row standardization over the VALID PREFIX only,
# frozen cached keys. O(T d) per token. Divergence vs the exact sampler is
# measured (not assumed) in benchmarks/decode.md; when the prompt fills the
# whole block, the FIRST generated token matches the exact sampler bit-for-
# bit (same column statistics), which the unit test pins.
# TinyTransformerLM only (GPT_MoP's gate convs are also non-causal, which
# would stack a second approximation).


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)) * p["scale"] + p["bias"]


def _lin(x, p):
    from ..ops.quant import Q4Tensor, QTensor, q4matmul, qmatmul

    k = p["kernel"]
    if isinstance(k, QTensor):
        y = qmatmul(x, k)
    elif isinstance(k, Q4Tensor):
        y = q4matmul(x, k)
    else:
        y = x @ k
    if "lora_a" in p:
        # Per-row LoRA delta (multi-adapter serving): ``lora_a`` (B, din, r)
        # and ``lora_b`` (B, r, dout) are PER-BATCH-ROW rank-r factors
        # (row b holds that request's adapter, zeros = no adapter), so one
        # fixed-shape step serves heterogeneous adapters: y_b += x_b A_b B_b.
        t = jnp.einsum("b...d,bdr->b...r", x, p["lora_a"])
        y = y + jnp.einsum("b...r,bro->b...o", t, p["lora_b"]).astype(
            y.dtype)
    if "bias" in p:
        y = y + p["bias"]
    return y


def _cols_mask(n_cols: int, n_valid):
    """(1|B, 1, 1, n_cols) bool mask of the valid prefix; ``n_valid`` may be
    a scalar (shared length) or a (B,) vector (per-row lengths — the
    continuous-batching serving engine)."""
    nv = jnp.asarray(n_valid).reshape(-1, 1)
    return (jnp.arange(n_cols)[None, :] < nv)[:, None, None, :]


def _standardize_rows(s, n_valid, eps):
    """Unbiased row standardization over the first ``n_valid`` columns
    (reference quartet_attn_patch.py:95-98 restricted to the live prefix).
    ``n_valid``: scalar or per-row (B,) vector."""
    cols = _cols_mask(s.shape[-1], n_valid)
    n = jnp.maximum(jnp.asarray(n_valid), 1).reshape(-1, 1, 1, 1)
    mu = jnp.sum(jnp.where(cols, s, 0.0), -1, keepdims=True) / n
    var = jnp.sum(jnp.where(cols, jnp.square(s - mu), 0.0), -1,
                  keepdims=True) / jnp.maximum(n - 1, 1)
    return (s - mu) / (jnp.sqrt(var) + eps)


def init_decode_cache(config, batch: int, dtype=jnp.float32,
                      n_views: int = 0):
    """Per-layer (k, k2, v) ring caches of shape (L, B, H, block, dk).

    ``dtype=jnp.int8`` selects the QUANTIZED cache layout: int8 rows plus
    per-row fp32 scales ``k_s/k2_s/v_s`` of shape (L, B, H, block) —
    4x less KV HBM than fp32 at ~3% overhead for the scales. Writers
    quantize with :func:`_q8_rows`; :func:`_attn_step` applies the scales
    after its dots, so the int8 rows feed the MXU directly.

    ``n_views > 0`` (GPT_MoP): adds a per-layer view-vector history ``mv``
    of shape (L, B, block, V) — the gate conv's tap source. V is tiny
    (default 5) so this is ~V/(3*n_embd) of the KV pool; kept fp32."""
    L, h = config.n_layer, config.n_head
    dk = config.n_embd // h
    shape = (L, batch, h, config.block_size, dk)
    cache = {
        "k": jnp.zeros(shape, dtype),
        "k2": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "len": jnp.zeros((), jnp.int32),
    }
    if dtype == jnp.int8:
        for key in ("k_s", "k2_s", "v_s"):
            cache[key] = jnp.ones(shape[:4], jnp.float32)
    if n_views:
        cache["mv"] = jnp.zeros((L, batch, config.block_size, n_views),
                                jnp.float32)
    return cache


def model_n_views(model) -> int:
    """Cache-layout probe: GPT_MoP models carry ``n_views`` (their blocks
    gate between attention and MLP); everything else decodes gate-free."""
    return int(getattr(model, "n_views", 0) or 0)


def _mop_taps(mv, pos, ks: int, causal: bool):
    """Gather the gate conv's tap rows from the view history.

    mv: (B, block, V) one layer's view vectors; pos: (B,) or (B, G) output
    positions. Returns (B, G, ks, V) where tap j of output position t is
    the view row at ``t-(ks-1)+j`` (causal left-pad) or ``t-ks//2+j``
    (reference centered same-pad). Taps outside ``[0, t]`` are zero: before
    0 that is the conv's zero padding; after t it is the FRONTIER
    approximation for the non-causal variant (the same-pad conv sees zeros
    past the end of the window — exactly what the full forward computes at
    its last position) and never happens for the causal variant."""
    b, block, V = mv.shape
    pos2 = jnp.asarray(pos).reshape(b, -1)  # (B, G)
    start = pos2 - (ks - 1) if causal else pos2 - (ks // 2)
    pidx = start[..., None] + jnp.arange(ks)  # (B, G, ks)
    ok = (pidx >= 0) & (pidx <= pos2[..., None])
    flat = jnp.clip(pidx.reshape(b, -1), 0, block - 1)
    g = jnp.take_along_axis(mv, flat[..., None], axis=1)
    g = g.reshape(b, pos2.shape[1], ks, V)
    return jnp.where(ok[..., None], g, 0.0)


def _mop_gates(bp, mv, pos, causal: bool):
    """MoP gate values for decode. bp: one block's params (must contain
    ``views``/``kernels``/``fuse``); mv: (B, block, V) view history already
    holding the rows at ``pos``; pos: (B,) or (B, G). Returns (B, G) gate
    = 1 + a_pos*g_pos - a_neg*g_neg (no sigmoid — the 1D fuse, reference
    gpt_mop.py:50-68)."""
    kern = bp["kernels"]["conv"]["kernel"]  # (ks, V, K)
    ks = kern.shape[0]
    taps = _mop_taps(mv, pos, ks, causal)  # (B, G, ks, V)
    kmaps = jnp.einsum("bgjv,jvk->bgk", taps, kern)
    here = ks - 1 if causal else ks // 2  # the tap AT pos
    maps = jnp.concatenate([taps[:, :, here], kmaps], -1)  # (B, G, V+K)
    gates = maps @ bp["fuse"]["conv"]["kernel"][0]  # (B, G, 2)
    alpha = bp["fuse"]["alpha"]
    return 1.0 + alpha[0] * gates[..., 0] - alpha[1] * gates[..., 1]


def _q8_rows(rows):
    """Symmetric per-row int8 quantization: (..., T, dk) fp32 ->
    (int8 rows, (..., T) fp32 scales). All-zero rows get scale 1."""
    s = jnp.max(jnp.abs(rows), axis=-1) / 127.0
    s = jnp.where(s == 0.0, 1.0, s)
    q = jnp.round(rows / s[..., None]).astype(jnp.int8)
    return q, s


def _attn_step(p, cfg, x, k_all, k2_all, v_all, n_valid, scales=None):
    """One-token attention against caches that ALREADY hold this token's
    k/k2/v rows at position ``n_valid - 1``. x: (B, 1, C) -> (B, 1, C).

    ``scales``: optional (k_s, k2_s, v_s) per-row fp32 scales of shape
    (B, H, T) for int8 caches — K scales multiply the score columns after
    the dot; V scales fold into the attention weights before the value
    dot, so the int8 rows are consumed without a dequantized copy.

    (The caller writes the single new row with ``lax.dynamic_update_slice``
    — O(d) traffic — instead of a onehot-``where`` over the whole window,
    which read+wrote the full (B, H, block, dk) buffer per layer and
    dominated decode-step HBM traffic for long blocks.)"""
    b = x.shape[0]
    h = cfg.n_head
    c = cfg.n_embd
    dk = c // h
    split = lambda y: y.reshape(b, 1, h, dk).transpose(0, 2, 1, 3)
    q = split(_lin(x, p["q_proj"]))
    scale = 1.0 / jnp.sqrt(dk).astype(jnp.float32)

    col = lambda s: s[:, :, None, :]  # (B,H,T) -> broadcast over queries
    qk = jnp.einsum("bhqd,bhkd->bhqk", q, k_all.astype(q.dtype)) * scale
    if scales is not None:
        qk = qk * col(scales[0])
    eps = cfg.score_norm_eps
    if cfg.use_quartet:
        q2 = split(_lin(x, p["q2_proj"]))
        q2k2 = jnp.einsum("bhqd,bhkd->bhqk", q2,
                          k2_all.astype(q2.dtype)) * scale
        if scales is not None:
            q2k2 = q2k2 * col(scales[1])
        m = jax.nn.sigmoid(p["mixture"][0])
        s1 = _standardize_rows(qk, n_valid, eps)
        s2 = _standardize_rows(q2k2, n_valid, eps)
        scores = (1.0 - m) * s1 + m * (s1 * s2) * p["quartet_scale"][0]
    else:
        # non-quartet path uses a hardcoded 1e-5 (quartet_attn_patch.py:104)
        scores = _standardize_rows(qk, n_valid, 1e-5)
    cols = _cols_mask(k_all.shape[2], n_valid)
    scores = jnp.where(cols, scores, -jnp.inf)
    att = jax.nn.softmax(scores, axis=-1)
    if scales is not None:
        att = att * col(scales[2])
    y = jnp.einsum("bhqk,bhkd->bhqd", att, v_all.astype(att.dtype))
    y = y.transpose(0, 2, 1, 3).reshape(b, 1, c)
    return _lin(y, p["o_proj"])


def _kv_rows(p, cfg, x):
    """This token's k/k2/v cache rows from the pre-LN activations.
    x: (B, 1, C) -> three (B, H, 1, dk) rows (k2 := k when not quartet)."""
    b = x.shape[0]
    h = cfg.n_head
    dk = cfg.n_embd // h
    split = lambda y: y.reshape(b, 1, h, dk).transpose(0, 2, 1, 3)
    k = split(_lin(x, p["k_proj"]))
    v = split(_lin(x, p["v_proj"]))
    k2 = split(_lin(x, p["k2_proj"])) if cfg.use_quartet else k
    return k, k2, v


def decode_step(model, params, cache, token):
    """One cached decode step. token: (B,) int32 -> (logits (B, vocab),
    new cache). Appends the token at position cache['len'] (caller must
    ensure the window is not full). Accepts int8-quantized params
    (``mop_tpu.ops.quant.quantize_params``) transparently.

    GPT_MoP (cache carries ``mv``): the per-block gate is applied between
    attention and MLP from the view history — exact for the causal-gate
    variant, frontier-approximate for the reference-exact non-causal one
    (see :func:`_mop_taps`)."""
    cfg = model.config
    p = params["params"]
    b = token.shape[0]
    pos = cache["len"]
    n_valid = pos + 1
    mop_causal = bool(getattr(model, "causal_gate", False))
    x = p["wte"]["embedding"][token][:, None, :]  # (B, 1, C)
    if cfg.use_abs_pos_emb:
        x = x + p["wpe"]["embedding"][pos][None, None, :]

    new_cache = dict(cache)
    for i in range(cfg.n_layer):
        bp = p[f"blocks_{i}"]
        h = _ln(x, bp["ln1"])
        k_new, k2_new, v_new = _kv_rows(bp["attn"], cfg, h)
        wr = lambda buf, row: jax.lax.dynamic_update_slice(
            buf, row[None].astype(buf.dtype), (i, 0, 0, pos, 0))
        if "k_s" in cache:  # int8 cache: quantize the new rows per-row
            wr_s = lambda buf, s: jax.lax.dynamic_update_slice(
                buf, s[None], (i, 0, 0, pos))
            for key, row in (("k", k_new), ("k2", k2_new), ("v", v_new)):
                q8, s8 = _q8_rows(row)
                new_cache[key] = wr(new_cache[key], q8)
                new_cache[key + "_s"] = wr_s(new_cache[key + "_s"], s8)
            scales = (new_cache["k_s"][i], new_cache["k2_s"][i],
                      new_cache["v_s"][i])
        else:
            new_cache["k"] = wr(new_cache["k"], k_new)
            new_cache["k2"] = wr(new_cache["k2"], k2_new)
            new_cache["v"] = wr(new_cache["v"], v_new)
            scales = None
        a = _attn_step(bp["attn"], cfg, h, new_cache["k"][i],
                       new_cache["k2"][i], new_cache["v"][i], n_valid,
                       scales=scales)
        x = x + a
        if "views" in bp:  # MoP gate between attention and MLP
            v_row = _lin(x, bp["views"]["proj"])  # (B, 1, V)
            new_cache["mv"] = jax.lax.dynamic_update_slice(
                new_cache["mv"], v_row[None].astype(new_cache["mv"].dtype),
                (i, 0, pos, 0))
            gate = _mop_gates(bp, new_cache["mv"][i],
                              jnp.broadcast_to(pos, (b,)), mop_causal)
            x = x * gate[..., None]  # (B, 1) -> broadcast over C
        hm = _ln(x, bp["ln2"])
        x = x + _lin(gelu_tanh(_lin(hm, bp["mlp"]["fc"])), bp["mlp"]["proj"])

    x = _ln(x, p["ln_f"])
    logits = (x @ p["wte"]["embedding"].T)[:, 0, :]
    new_cache["len"] = cache["len"] + 1
    return logits, new_cache


def decode_chunk(model, params, cache, tokens):
    """Cached forward over a chunk of G new tokens at positions
    ``len .. len+G-1``. tokens: (B, G) int32 -> (logits (B, G, vocab),
    new cache with ``len`` advanced by G).

    Exactly equivalent to G sequential :func:`decode_step` calls (pinned in
    tests/test_speculative.py): row i standardizes and attends over the
    ``len+i+1``-column live prefix, and the chunk's own K/K2/V rows are
    written before attention so causal masking handles the intra-chunk
    dependencies. This is the verify pass of speculative decoding and a
    chunked prefill in one. Accepts int8-quantized params transparently.
    """
    cfg = model.config
    p = params["params"]
    b, g = tokens.shape
    h = cfg.n_head
    c = cfg.n_embd
    dk = c // h
    pos0 = cache["len"]
    positions = pos0 + jnp.arange(g)
    x = p["wte"]["embedding"][tokens]
    if cfg.use_abs_pos_emb:
        x = x + p["wpe"]["embedding"][positions][None]

    block = cache["k"].shape[3]
    nv = positions + 1  # row i's valid-prefix length
    cols4 = (jnp.arange(block)[None, :] < nv[:, None])[None, None]  # (1,1,G,block)
    nvf = nv.astype(jnp.float32)[None, None, :, None]

    def std(s, eps):
        # unbiased row standardization over each row's live prefix
        # (matches _standardize_rows / reference quartet_attn_patch.py:95-98)
        mu = jnp.sum(jnp.where(cols4, s, 0.0), -1, keepdims=True) / nvf
        var = jnp.sum(jnp.where(cols4, jnp.square(s - mu), 0.0), -1,
                      keepdims=True) / jnp.maximum(nvf - 1.0, 1.0)
        return (s - mu) / (jnp.sqrt(var) + eps)

    split = lambda y: y.reshape(b, g, h, dk).transpose(0, 2, 1, 3)
    scale = 1.0 / jnp.sqrt(dk).astype(jnp.float32)
    new_cache = dict(cache)
    for i in range(cfg.n_layer):
        bp = p[f"blocks_{i}"]
        hx = _ln(x, bp["ln1"])
        ap = bp["attn"]
        q = split(_lin(hx, ap["q_proj"]))
        k_new = split(_lin(hx, ap["k_proj"]))
        v_new = split(_lin(hx, ap["v_proj"]))
        k2_new = split(_lin(hx, ap["k2_proj"])) if cfg.use_quartet else k_new
        wr = lambda buf, rows: jax.lax.dynamic_update_slice(
            buf, rows[None].astype(buf.dtype), (i, 0, 0, pos0, 0))
        if "k_s" in cache:
            # int8 KV: quantize the G new rows per-row and consume the
            # int8 window without a dequantized copy — K scales multiply
            # the score columns after the dot, V scales fold into the
            # attention weights (same contract as _attn_step's scales)
            wr_s = lambda buf, srows: jax.lax.dynamic_update_slice(
                buf, srows[None], (i, 0, 0, pos0))
            for key, rows in (("k", k_new), ("k2", k2_new), ("v", v_new)):
                q8, s8 = _q8_rows(rows)
                new_cache[key] = wr(new_cache[key], q8)
                new_cache[key + "_s"] = wr_s(new_cache[key + "_s"], s8)
            col = lambda s: s[:, :, None, :]  # (B,H,T) -> over queries
            k_sc, k2_sc, v_sc = (col(new_cache["k_s"][i]),
                                 col(new_cache["k2_s"][i]),
                                 col(new_cache["v_s"][i]))
        else:
            new_cache["k"] = wr(new_cache["k"], k_new)
            new_cache["k2"] = wr(new_cache["k2"], k2_new)
            new_cache["v"] = wr(new_cache["v"], v_new)
            k_sc = k2_sc = v_sc = None
        qk = jnp.einsum("bhqd,bhkd->bhqk", q,
                        new_cache["k"][i].astype(q.dtype)) * scale
        if k_sc is not None:
            qk = qk * k_sc
        if cfg.use_quartet:
            q2 = split(_lin(hx, ap["q2_proj"]))
            q2k2 = jnp.einsum(
                "bhqd,bhkd->bhqk", q2,
                new_cache["k2"][i].astype(q2.dtype)) * scale
            if k2_sc is not None:
                q2k2 = q2k2 * k2_sc
            m = jax.nn.sigmoid(ap["mixture"][0])
            s1 = std(qk, cfg.score_norm_eps)
            s2 = std(q2k2, cfg.score_norm_eps)
            scores = (1.0 - m) * s1 + m * (s1 * s2) * ap["quartet_scale"][0]
        else:
            scores = std(qk, 1e-5)  # non-quartet hardcodes 1e-5
        scores = jnp.where(cols4, scores, -jnp.inf)
        att = jax.nn.softmax(scores, axis=-1)
        if v_sc is not None:
            att = att * v_sc
        y = jnp.einsum("bhqk,bhkd->bhqd", att,
                       new_cache["v"][i].astype(att.dtype))
        y = y.transpose(0, 2, 1, 3).reshape(b, g, c)
        x = x + _lin(y, ap["o_proj"])
        if "views" in bp:  # MoP gate, per chunk position (taps <= pos —
            # matches the composition of decode_step calls exactly)
            v_rows = _lin(x, bp["views"]["proj"])  # (B, G, V)
            new_cache["mv"] = jax.lax.dynamic_update_slice(
                new_cache["mv"],
                v_rows[None].astype(new_cache["mv"].dtype), (i, 0, pos0, 0))
            gate = _mop_gates(
                bp, new_cache["mv"][i],
                jnp.broadcast_to(positions[None, :], (b, g)),
                bool(getattr(model, "causal_gate", False)))
            x = x * gate[..., None]
        hm = _ln(x, bp["ln2"])
        x = x + _lin(gelu_tanh(_lin(hm, bp["mlp"]["fc"])), bp["mlp"]["proj"])

    x = _ln(x, p["ln_f"])
    logits = x @ p["wte"]["embedding"].T  # (B, G, vocab)
    new_cache["len"] = pos0 + g
    return logits, new_cache


def _mop_gate_full(bp, x, t_live=None, causal: bool = False):
    """Full-window MoP gate for prefill. x: (B, T, C) post-attention
    activations. Returns ``(gate (B, T), v (B, T, V))`` computed exactly as
    the flax forward: views linear -> k-tap conv (left-padded when
    ``causal``, centered same-pad otherwise) -> 1x1 fuse -> 1 + a+*g+ -
    a-*g-. ``t_live``: optional live length (padded prefill; scalar or a
    per-row (B,) vector) — view rows at positions >= t_live are zeroed
    before the conv so pad columns cannot leak through the taps (the tap
    at the last live position's right edge then reads zero, matching both
    the unpadded prefill and the decode frontier)."""
    v = _lin(x, bp["views"]["proj"])  # (B, T, V)
    t = v.shape[1]
    if t_live is not None:
        lv = jnp.atleast_1d(jnp.asarray(t_live))
        v = jnp.where((jnp.arange(t)[None, :] < lv[:, None])[..., None],
                      v, 0.0)
    kern = bp["kernels"]["conv"]["kernel"]  # (ks, V, K)
    ks = kern.shape[0]
    pad = (ks - 1, 0) if causal else (ks // 2, ks - 1 - ks // 2)
    vp = jnp.pad(v, ((0, 0), pad, (0, 0)))
    kmaps = sum(jnp.einsum("btv,vk->btk", vp[:, j:j + t], kern[j])
                for j in range(ks))
    maps = jnp.concatenate([v, kmaps], -1)  # (B, T, V+K)
    gates = maps @ bp["fuse"]["conv"]["kernel"][0]  # (B, T, 2)
    alpha = bp["fuse"]["alpha"]
    gate = 1.0 + alpha[0] * gates[..., 0] - alpha[1] * gates[..., 1]
    return gate, v


def prefill(model, params, prompt, kv_dtype=jnp.float32):
    """Dense prefill: one full forward over the (B, T0) prompt with prefix
    (T0-column) standardization semantics, capturing per-layer K/K2/V into
    a fresh cache and returning (last-position logits, cache).

    ``kv_dtype``: storage dtype of the K/K2/V caches (compute stays fp32).
    bfloat16 halves cache HBM and read bandwidth — the dominant decode-step
    traffic once the context is long (benchmarks/decode.md measures the
    win and the greedy-agreement cost)."""
    cfg = model.config
    p = params["params"]
    b, t0 = prompt.shape
    cache = init_decode_cache(cfg, b, kv_dtype, n_views=model_n_views(model))
    mop_causal = bool(getattr(model, "causal_gate", False))
    x = p["wte"]["embedding"][prompt]
    if cfg.use_abs_pos_emb:
        x = x + p["wpe"]["embedding"][jnp.arange(t0)][None]
    h_ = cfg.n_head
    dk = cfg.n_embd // h_
    split = lambda y: y.reshape(b, t0, h_, dk).transpose(0, 2, 1, 3)
    scale = 1.0 / jnp.sqrt(dk).astype(jnp.float32)
    causal = jnp.tril(jnp.ones((t0, t0), bool))
    eps = cfg.score_norm_eps

    if getattr(cfg, "causal_std", False):
        from ..ops.attention import standardize_scores_causal

        def std(s, e=eps):  # causal variant: per-row prefix statistics
            return standardize_scores_causal(s, e)
    else:
        def std(s, e=eps):  # unbiased row std over all t0 columns
            mu = jnp.mean(s, -1, keepdims=True)
            var = jnp.sum(jnp.square(s - mu), -1,
                          keepdims=True) / max(1, t0 - 1)
            return (s - mu) / (jnp.sqrt(var) + e)

    for i in range(cfg.n_layer):
        bp = p[f"blocks_{i}"]
        hx = _ln(x, bp["ln1"])
        ap = bp["attn"]
        q, k, v = (split(_lin(hx, ap[n]))
                   for n in ("q_proj", "k_proj", "v_proj"))
        qk = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        if cfg.use_quartet:
            q2 = split(_lin(hx, ap["q2_proj"]))
            k2 = split(_lin(hx, ap["k2_proj"]))
            q2k2 = jnp.einsum("bhqd,bhkd->bhqk", q2, k2) * scale
            m = jax.nn.sigmoid(ap["mixture"][0])
            scores = ((1.0 - m) * std(qk)
                      + m * (std(qk) * std(q2k2)) * ap["quartet_scale"][0])
        else:
            k2 = k
            scores = std(qk, 1e-5)  # non-quartet hardcodes 1e-5
        scores = jnp.where(causal[None, None], scores, -jnp.inf)
        att = jax.nn.softmax(scores, axis=-1)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, t0, cfg.n_embd)
        x = x + _lin(y, ap["o_proj"])
        if "views" in bp:  # MoP gate between attention and MLP
            gate, vmaps = _mop_gate_full(bp, x, causal=mop_causal)
            cache["mv"] = cache["mv"].at[i, :, :t0, :].set(
                vmaps.astype(cache["mv"].dtype))
            x = x * gate[..., None]
        hm = _ln(x, bp["ln2"])
        x = x + _lin(gelu_tanh(_lin(hm, bp["mlp"]["fc"])), bp["mlp"]["proj"])
        pad = cfg.block_size - t0
        put = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kd = cache["k"].dtype
        if "k_s" in cache:  # int8 cache: per-row quantized rows + scales
            put_s = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, pad)),
                                      constant_values=1.0)
            for key, t in (("k", k), ("k2", k2), ("v", v)):
                q8, s8 = _q8_rows(t)
                cache[key] = cache[key].at[i].set(put(q8))
                cache[key + "_s"] = cache[key + "_s"].at[i].set(put_s(s8))
        else:
            cache["k"] = cache["k"].at[i].set(put(k).astype(kd))
            cache["k2"] = cache["k2"].at[i].set(put(k2).astype(kd))
            cache["v"] = cache["v"].at[i].set(put(v).astype(kd))

    x = _ln(x, p["ln_f"])
    logits = (x @ p["wte"]["embedding"].T)[:, -1, :]
    cache["len"] = jnp.asarray(t0, jnp.int32)
    return logits, cache


def prefill_padded(model, params, prompt_padded, t0, kv_dtype=jnp.float32):
    """Exact prefill over a PADDED prompt: ``prompt_padded`` is (B, T_pad)
    with the real prompt in the first ``t0`` columns (``t0`` may be a
    traced scalar — ONE compile serves every prompt length up to T_pad).

    Matches :func:`prefill` on the live region exactly (standardization and
    softmax over the first ``t0`` columns only — pad columns are masked out
    of the row statistics): same last-live-position logits, same first
    ``t0`` cache rows, same ``len``. Rows written past ``t0`` are garbage,
    but the returned ``len = t0`` masks them and later appends overwrite
    them — the same convention as speculative rollback.

    This is the serving engine's admission path: bucketing prompt lengths
    to a few pad sizes bounds jit compiles at the bucket count instead of
    one per distinct prompt length.
    """
    cfg = model.config
    p = params["params"]
    b, t_pad = prompt_padded.shape
    t0 = jnp.asarray(t0, jnp.int32)
    cache = init_decode_cache(cfg, b, kv_dtype, n_views=model_n_views(model))
    mop_causal = bool(getattr(model, "causal_gate", False))
    x = p["wte"]["embedding"][prompt_padded]
    if cfg.use_abs_pos_emb:
        x = x + p["wpe"]["embedding"][jnp.arange(t_pad)][None]
    h_ = cfg.n_head
    dk = cfg.n_embd // h_
    split = lambda y: y.reshape(b, t_pad, h_, dk).transpose(0, 2, 1, 3)
    scale = 1.0 / jnp.sqrt(dk).astype(jnp.float32)
    live = jnp.arange(t_pad) < t0  # (T_pad,) live-column mask
    causal = jnp.tril(jnp.ones((t_pad, t_pad), bool)) & live[None, :]
    nf = jnp.maximum(t0, 1).astype(jnp.float32)
    eps = cfg.score_norm_eps

    if getattr(cfg, "causal_std", False):
        from ..ops.attention import standardize_scores_causal

        def std(s, e=eps):
            # causal variant: row i's prefix (cols <= i) is entirely live
            # for every live row, so the pad mask is a no-op here
            return standardize_scores_causal(s, e)
    else:
        def std(s, e=eps):
            # unbiased row standardization over the t0 live columns
            # (prefill's all-prompt-columns semantics under the pad mask)
            m = live[None, None, None, :]
            mu = jnp.sum(jnp.where(m, s, 0.0), -1, keepdims=True) / nf
            var = jnp.sum(jnp.where(m, jnp.square(s - mu), 0.0), -1,
                          keepdims=True) / jnp.maximum(nf - 1.0, 1.0)
            return (s - mu) / (jnp.sqrt(var) + e)

    for i in range(cfg.n_layer):
        bp = p[f"blocks_{i}"]
        hx = _ln(x, bp["ln1"])
        ap = bp["attn"]
        q, k, v = (split(_lin(hx, ap[n]))
                   for n in ("q_proj", "k_proj", "v_proj"))
        qk = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        if cfg.use_quartet:
            q2 = split(_lin(hx, ap["q2_proj"]))
            k2 = split(_lin(hx, ap["k2_proj"]))
            q2k2 = jnp.einsum("bhqd,bhkd->bhqk", q2, k2) * scale
            m = jax.nn.sigmoid(ap["mixture"][0])
            scores = ((1.0 - m) * std(qk)
                      + m * (std(qk) * std(q2k2)) * ap["quartet_scale"][0])
        else:
            k2 = k
            scores = std(qk, 1e-5)  # non-quartet hardcodes 1e-5
        scores = jnp.where(causal[None, None], scores, -jnp.inf)
        att = jax.nn.softmax(scores, axis=-1)
        # pad rows are fully masked -> softmax over -inf only would be NaN;
        # their outputs are garbage anyway, so zero them explicitly
        att = jnp.where(jnp.isnan(att), 0.0, att)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, t_pad, cfg.n_embd)
        x = x + _lin(y, ap["o_proj"])
        if "views" in bp:  # MoP gate; pad-row views zeroed before the conv
            gate, vmaps = _mop_gate_full(bp, x, t_live=t0,
                                         causal=mop_causal)
            cache["mv"] = cache["mv"].at[i, :, :t_pad, :].set(
                vmaps.astype(cache["mv"].dtype))
            x = x * gate[..., None]
        hm = _ln(x, bp["ln2"])
        x = x + _lin(gelu_tanh(_lin(hm, bp["mlp"]["fc"])), bp["mlp"]["proj"])
        pad = cfg.block_size - t_pad
        put = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kd = cache["k"].dtype
        if "k_s" in cache:  # int8 cache: per-row quantized rows + scales
            put_s = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, pad)),
                                      constant_values=1.0)
            for key, t in (("k", k), ("k2", k2), ("v", v)):
                q8, s8 = _q8_rows(t)
                cache[key] = cache[key].at[i].set(put(q8))
                cache[key + "_s"] = cache[key + "_s"].at[i].set(put_s(s8))
        else:
            cache["k"] = cache["k"].at[i].set(put(k).astype(kd))
            cache["k2"] = cache["k2"].at[i].set(put(k2).astype(kd))
            cache["v"] = cache["v"].at[i].set(put(v).astype(kd))

    x = _ln(x, p["ln_f"])
    last = jax.lax.dynamic_index_in_dim(x, t0 - 1, axis=1, keepdims=False)
    logits = last @ p["wte"]["embedding"].T  # (B, vocab)
    cache["len"] = t0
    return logits, cache


def generate_cached(
    model,
    params,
    prompt: Array,
    max_new_tokens: int,
    rng: Optional[Array] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    kv_dtype=jnp.float32,
    grow_window: bool = False,
    min_p: Optional[float] = None,
    repetition_penalty: Optional[float] = None,
    presence_penalty: Optional[float] = None,
    frequency_penalty: Optional[float] = None,
) -> Array:
    """KV-cached greedy/sampled decode for TinyTransformerLM (approximate —
    see the module comment; measured divergence in benchmarks/decode.md).

    ``min_p`` keeps only tokens with probability >= min_p * max_prob;
    ``repetition_penalty`` (CTRL-style, applies to prompt+output tokens),
    ``presence_penalty`` and ``frequency_penalty`` (OpenAI-style additive,
    output tokens only) follow the vLLM conventions and also apply under
    greedy decoding (see :func:`_apply_penalties`).

    ``kv_dtype=jnp.bfloat16`` stores the K/K2/V caches in bf16 (compute
    stays fp32): half the cache HBM and half the per-step KV read traffic —
    the dominant decode cost at long context — at a small extra score
    perturbation on top of the cache approximation itself (both measured in
    benchmarks/decode.md). ``kv_dtype=jnp.int8`` quantizes each cached row
    symmetrically with a per-row fp32 scale (4x less KV HBM; scales applied
    after the dots, see :func:`_attn_step`).

    ``grow_window=True``: window-doubling decode — the KV window starts at
    the smallest power of two holding the prompt and DOUBLES as the
    sequence fills it, so each step's KV reads and score/standardization
    width track the live length instead of paying full ``block_size`` from
    step one. Mathematically identical (columns beyond the live prefix are
    masked out of every statistic; bit-exact equality pinned on CPU in
    tests/test_grow_window.py — on TPU the narrower einsum tiles reduce in
    a different order, perturbing scores at the float ulp level exactly
    like any re-tiling of the same computation). Measured on v5e: 1.19x /
    1.32x at block 1024/2048 (1.60x/1.63x combined with bf16 KV); at block
    <= 512 the extra per-segment dispatches cost more than the saved
    traffic — keep the single-scan path there (benchmarks/decode.md).
    Tradeoffs: one XLA compile per window size (log2(block) of them), and
    the OUTER call can no longer be wrapped in a single jax.jit (each
    segment is jitted internally).

    Requires t0 + max_new_tokens <= block_size (no ring eviction: evicting
    would invalidate the frozen prefix statistics silently)."""
    cfg = model.config
    b, t0 = prompt.shape
    if t0 + max_new_tokens > cfg.block_size:
        raise ValueError(
            f"generate_cached: t0 + max_new_tokens = {t0 + max_new_tokens} "
            f"exceeds block_size {cfg.block_size}")
    greedy = rng is None or temperature == 0.0
    if rng is None:
        rng = jax.random.PRNGKey(0)

    logits0, cache = prefill(model, params, prompt.astype(jnp.int32),
                             kv_dtype=kv_dtype)

    pick = _make_pick(greedy, temperature, top_k, top_p, min_p,
                      repetition_penalty, presence_penalty,
                      frequency_penalty)
    if pick.uses_counts:
        pcounts = _prompt_counts(prompt.astype(jnp.int32), model.vocab_size)
        ocounts0 = jnp.zeros_like(pcounts)
    else:  # (B, 1) dummies keep one carry shape; pick ignores them
        pcounts = jnp.zeros((b, 1), jnp.int32)
        ocounts0 = pcounts
    tok0, rng = pick(logits0, rng, ocounts0, pcounts)
    ocounts = ocounts0.at[jnp.arange(b), tok0].add(1) \
        if pick.uses_counts else ocounts0

    if grow_window:
        return _generate_grow_window(
            model, params, prompt, max_new_tokens, cache, tok0, rng,
            greedy, temperature, top_k, top_p, min_p, repetition_penalty,
            presence_penalty, frequency_penalty, ocounts, pcounts)

    def step(carry, _):
        tok, cache, rng, oc = carry
        logits, cache = decode_step(model, params, cache, tok)
        nxt, rng = pick(logits, rng, oc, pcounts)
        if pick.uses_counts:
            oc = oc.at[jnp.arange(b), nxt].add(1)
        return (nxt, cache, rng, oc), tok

    (last, _, _, _), toks = jax.lax.scan(
        step, (tok0, cache, rng, ocounts), None, length=max_new_tokens - 1)
    out = jnp.concatenate([toks.T, last[:, None]], axis=1)
    return jnp.concatenate([prompt.astype(jnp.int32), out], axis=1)


def _make_pick(greedy, temperature, top_k, top_p, min_p=None,
               repetition_penalty=None, presence_penalty=None,
               frequency_penalty=None):
    """The shared greedy/temperature/top-k/top-p/min-p token picker — one
    definition so the plain and grow-window paths cannot drift. When any
    penalty is set the returned ``pick`` expects per-row output-token counts
    and prompt counts (see :func:`_apply_penalties`); penalties apply to
    greedy decoding too (penalized greedy is the deterministic variant)."""
    uses_counts = any(p is not None and p != d for p, d in (
        (repetition_penalty, 1.0), (presence_penalty, 0.0),
        (frequency_penalty, 0.0)))

    def pick(logits, rng, out_counts=None, prompt_counts=None):
        if uses_counts:
            seen = (out_counts > 0) | (prompt_counts > 0)
            logits = _apply_penalties(logits, out_counts, seen,
                                      repetition_penalty, presence_penalty,
                                      frequency_penalty)
        if greedy:
            return jnp.argmax(logits, -1).astype(jnp.int32), rng
        scaled = logits / jnp.maximum(temperature, 1e-6)
        if top_k is not None:
            kth = jnp.sort(scaled, -1)[:, -top_k][:, None]
            scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
        if top_p is not None and top_p < 1.0:
            scaled = _top_p_mask(scaled, top_p)
        if min_p is not None and min_p > 0.0:
            scaled = _min_p_mask(scaled, min_p)
        rng, sub = jax.random.split(rng)
        return jax.random.categorical(sub, scaled).astype(jnp.int32), rng

    pick.uses_counts = uses_counts
    return pick


def _prompt_counts(prompt: Array, vocab: int) -> Array:
    """(B, T0) int tokens -> (B, vocab) int32 occurrence counts."""
    b = prompt.shape[0]
    zeros = jnp.zeros((b, vocab), jnp.int32)
    return zeros.at[jnp.arange(b)[:, None], prompt].add(1)


_GROW_SEG_CACHE: "dict" = {}
_GROW_SEG_CACHE_MAX = 32  # FIFO bound: each entry pins a jit + compiles


def _grow_segment_fn(model, greedy, temperature, top_k, top_p, min_p=None,
                     repetition_penalty=None, presence_penalty=None,
                     frequency_penalty=None):
    """Jitted n-step decode segment for window-doubling decode, cached per
    (model VALUE, sampler config) so repeat generate_cached calls reuse
    compiles. Keyed on the module's dataclass repr (value-based and stable
    — TransformerConfig is a plain dataclass, so flax's __hash__ raises),
    never on object identity (a freed id can be reused). jit specializes
    further on (window, n). FIFO-bounded: long-lived processes sweeping
    sampler configs don't accumulate compiled closures without bound."""
    key = (type(model).__qualname__, repr(model), bool(greedy),
           float(temperature), top_k, top_p, min_p, repetition_penalty,
           presence_penalty, frequency_penalty)
    cached = _GROW_SEG_CACHE.get(key)
    if cached is not None:
        return cached

    pick = _make_pick(greedy, temperature, top_k, top_p, min_p,
                      repetition_penalty, presence_penalty,
                      frequency_penalty)

    @functools.partial(jax.jit, static_argnums=(2,))
    def seg(params, carry, n, pcounts):
        def body(c, _):
            tok, cache, rng, oc = c
            logits, cache = decode_step(model, params, cache, tok)
            nxt, rng = pick(logits, rng, oc, pcounts)
            if pick.uses_counts:
                oc = oc.at[jnp.arange(tok.shape[0]), nxt].add(1)
            return (nxt, cache, rng, oc), tok

        return jax.lax.scan(body, carry, None, length=n)

    while len(_GROW_SEG_CACHE) >= _GROW_SEG_CACHE_MAX:
        _GROW_SEG_CACHE.pop(next(iter(_GROW_SEG_CACHE)))
    _GROW_SEG_CACHE[key] = seg
    return seg


def _generate_grow_window(model, params, prompt, max_new_tokens, cache,
                          tok0, rng, greedy, temperature, top_k, top_p,
                          min_p, repetition_penalty, presence_penalty,
                          frequency_penalty, ocounts, pcounts):
    """Window-doubling decode loop for :func:`generate_cached`.

    The cache's column axis is kept at a power of two >= the live length;
    math over masked columns is inert, so every segment is exactly the
    full-window computation restricted to a prefix — outputs are
    bit-identical, traffic tracks the live length. Host loop over
    log2-many jitted segments (lax.scan inside each)."""
    t0 = prompt.shape[1]
    block = cache["k"].shape[3]
    seg = _grow_segment_fn(model, greedy, temperature, top_k, top_p, min_p,
                           repetition_penalty, presence_penalty,
                           frequency_penalty)
    w = min(1 << max(6, t0.bit_length()), block)  # pow2 >= t0+1, floor 64

    def _resize(c, new_w, cur_w):
        """Slice (new_w < cur_w) or zero-pad the position axis of every KV
        buffer — KV rows (axis 3 of 5), int8 per-row scales (axis 3 of 4),
        and the MoP view history ``mv`` (axis 2 of its (L, B, block, V))."""
        out = dict(c)
        for key in ("k", "k2", "v", "k_s", "k2_s", "v_s", "mv"):
            if key not in c:
                continue
            v = c[key]
            axis = 2 if key == "mv" else 3
            if new_w < cur_w:
                sl = [slice(None)] * v.ndim
                sl[axis] = slice(None, new_w)
                out[key] = v[tuple(sl)]
            else:
                padw = [(0, 0)] * v.ndim
                padw[axis] = (0, new_w - cur_w)
                out[key] = jnp.pad(v, padw)
        return out

    cache = _resize(cache, w, block)
    carry = (tok0, cache, rng, ocounts)
    pos = t0
    remaining = max_new_tokens - 1
    toks_parts = []
    while remaining > 0:
        n = min(remaining, w - pos)  # steps before the window fills
        carry, toks = seg(params, carry, n, pcounts)
        toks_parts.append(toks)
        pos += n
        remaining -= n
        if remaining > 0:
            nw = min(2 * w, block)
            tok, c, r, oc = carry
            carry = (tok, _resize(c, nw, w), r, oc)
            w = nw
    last = carry[0]
    out = jnp.concatenate([t.T for t in toks_parts] + [last[:, None]],
                          axis=1)
    return jnp.concatenate([prompt.astype(jnp.int32), out], axis=1)


# ---------------------- exact cached Whisper decode ----------------------
#
# Unlike the GPT family, the Whisper decoder (``whisper_mop.py:251-269``)
# is a standard pre-LN causal transformer — no pre-mask standardization —
# so an incremental KV cache is EXACT: position i's activations depend only
# on positions <= i. Per layer: self-attention K/V appended per token,
# cross-attention K/V computed ONCE from the encoder memory. O(T d + T_enc
# d) per token instead of whisper_transcribe's full-window O(T^2 d +
# T T_enc d) re-run.


def _mha(q, ks, vs, n_valid=None, scales=None):
    """q: (B,H,1,dh) against ks/vs (B,H,T,dh); optional valid-prefix mask.

    ``scales``: optional (k_s, v_s) per-row fp32 scales of shape (B,H,T)
    for int8 caches — K scales multiply the score columns after the dot,
    V scales fold into the attention weights (same contract as
    :func:`_attn_step`)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q,
                   ks.astype(q.dtype)) / jnp.sqrt(q.shape[-1]).astype(
        jnp.float32)
    if scales is not None:
        s = s * scales[0][:, :, None, :]
    if n_valid is not None:
        cols = jnp.arange(ks.shape[2]) < n_valid
        s = jnp.where(cols[None, None, None, :], s, -jnp.inf)
    a = jax.nn.softmax(s, axis=-1)
    if scales is not None:
        a = a * scales[1][:, :, None, :]
    return jnp.einsum("bhqk,bhkd->bhqd", a, vs.astype(a.dtype))


def whisper_decode_prep(model, params, mel: Array, kv_dtype=jnp.float32):
    """One encoder pass + per-layer cross-attention K/V for cached Whisper
    decoding. Returns ``(p, cfg, cross_k, cross_v)`` where cross_k/v are
    (L, B, H, T_enc, dh). Shared by the greedy, beam, and serving paths."""
    from ..ops.quant import Q4Tensor, QTensor, dequantize_params

    cfg = model.cfg
    p = params["params"]
    h = cfg.n_head
    dh = cfg.n_embd // h
    L = cfg.n_layer_dec
    # The flax encoder module cannot consume Q/Q4Tensor leaves; if the
    # params are int8/int4-quantized, dequantize for the ONE encoder pass
    # (the decode loop reads the quantized weights through _lin).
    is_q = lambda l: isinstance(l, (QTensor, Q4Tensor))
    has_q = any(is_q(l) for l in jax.tree_util.tree_leaves(
        params, is_leaf=is_q))
    enc_params = dequantize_params(params) if has_q else params
    enc_out, _ = model.apply(enc_params, mel, method=model.encode)
    b = mel.shape[0]
    tk = enc_out.shape[1]
    cross_kv = []
    for i in range(L):
        cp = p[f"decoder_{i}"]["cross_attn"]
        ck = _lin(enc_out, cp["k_proj"]).reshape(b, tk, h, dh).transpose(
            0, 2, 1, 3)
        cv = _lin(enc_out, cp["v_proj"]).reshape(b, tk, h, dh).transpose(
            0, 2, 1, 3)
        cross_kv.append((ck, cv))
    cross_k = jnp.stack([kv[0] for kv in cross_kv]).astype(kv_dtype)
    cross_v = jnp.stack([kv[1] for kv in cross_kv]).astype(kv_dtype)
    return p, cfg, cross_k, cross_v


def whisper_decode_token(p, cfg, tok: Array, pos, ks, vs, cross_k,
                         cross_v, scales=None):
    """One exact cached Whisper decoder step for (B,) tokens at position
    ``pos``: writes this token's self-attention K/V rows at ``pos`` and
    returns ``(logits (B, vocab), new_ks, new_vs)``. The reusable core of
    the greedy scan and the beam search.

    ``scales``: optional int8-KV scale dict with keys ``k_s``/``v_s``
    ((L,B,H,win) self-attention per-row scales — this token's rows are
    quantized and written here) and ``cross_k_s``/``cross_v_s``
    ((L,B,H,T_enc), frozen). When given, ks/vs/cross hold int8 rows and
    the return gains a 4th element: the updated scale dict."""
    b = tok.shape[0]
    h = cfg.n_head
    d = cfg.n_embd
    dh = d // h
    L = cfg.n_layer_dec
    lin = _lin

    def split1(y):  # (B, 1, D) -> (B, H, 1, dh)
        return y.reshape(b, 1, h, dh).transpose(0, 2, 1, 3)

    x = p["wte"]["embedding"][tok][:, None, :]
    if cfg.use_abs_pos_emb:
        x = x + p["text_pos"]["embedding"][pos][None, None, :]
    new_ks, new_vs = ks, vs
    new_sc = dict(scales) if scales is not None else None
    for li in range(L):
        bp = p[f"decoder_{li}"]
        hx = _ln(x, bp["ln1"])
        sp = bp["self_attn"]
        q = split1(lin(hx, sp["q_proj"]))
        k_new = split1(lin(hx, sp["k_proj"]))
        v_new = split1(lin(hx, sp["v_proj"]))
        if scales is not None:  # int8: per-row quantize the new rows
            k_new, k_s = _q8_rows(k_new)  # (B,H,1,dh) int8, (B,H,1)
            v_new, v_s = _q8_rows(v_new)
            wr_s = lambda buf, s: jax.lax.dynamic_update_slice(
                buf, s[None], (li, 0, 0, pos))
            new_sc["k_s"] = wr_s(new_sc["k_s"], k_s)
            new_sc["v_s"] = wr_s(new_sc["v_s"], v_s)
        # Single-row cache write (O(d) traffic, not a full-window where).
        new_ks = jax.lax.dynamic_update_slice(
            new_ks, k_new[None].astype(new_ks.dtype), (li, 0, 0, pos, 0))
        new_vs = jax.lax.dynamic_update_slice(
            new_vs, v_new[None].astype(new_vs.dtype), (li, 0, 0, pos, 0))
        self_sc = None if scales is None else (new_sc["k_s"][li],
                                               new_sc["v_s"][li])
        y = _mha(q, new_ks[li], new_vs[li], n_valid=pos + 1,
                 scales=self_sc)
        y = y.transpose(0, 2, 1, 3).reshape(b, 1, d)
        x = x + lin(y, sp["o_proj"])
        cx = _ln(x, bp["ln2"])
        cp = bp["cross_attn"]
        qc = split1(lin(cx, cp["q_proj"]))
        cross_sc = None if scales is None else (scales["cross_k_s"][li],
                                                scales["cross_v_s"][li])
        yc = _mha(qc, cross_k[li], cross_v[li], scales=cross_sc)
        yc = yc.transpose(0, 2, 1, 3).reshape(b, 1, d)
        x = x + lin(yc, cp["o_proj"])
        mx = _ln(x, bp["ln3"])
        mp = bp["mlp"]
        x = x + lin(gelu_tanh(lin(mx, mp["fc"])), mp["proj"])
    x = _ln(x, p["dec_ln_f"])
    logits = (x @ p["wte"]["embedding"].T)[:, 0, :]
    if scales is not None:
        return logits, new_ks, new_vs, new_sc
    return logits, new_ks, new_vs


def whisper_transcribe_cached(
    model,
    params,
    mel: Array,
    bos_token: int,
    max_tokens: int,
    kv_dtype=jnp.float32,
) -> Array:
    """Greedy transcription with exact per-layer KV caches.

    Produces the same tokens as ``whisper_transcribe`` (equality pinned in
    tests/test_generate.py) at O(T) per-token cost. Returns (B, max_tokens).
    ``kv_dtype=jnp.bfloat16`` halves self- and cross-attention KV storage
    and read traffic (compute stays fp32). ``kv_dtype=jnp.int8`` quantizes
    every cached row (self AND cross) symmetrically with a per-row fp32
    scale — 4x less KV HBM, scales applied after the dots exactly as in
    :func:`_attn_step` (quality rung measured in
    benchmarks/quality_ladder.md).
    """
    int8 = kv_dtype == jnp.int8
    p, cfg, cross_k, cross_v = whisper_decode_prep(
        model, params, mel, jnp.float32 if int8 else kv_dtype)
    b = mel.shape[0]
    h = cfg.n_head
    dh = cfg.n_embd // h
    L = cfg.n_layer_dec
    win = max_tokens + 1
    k0 = jnp.zeros((L, b, h, win, dh), kv_dtype)
    v0 = jnp.zeros((L, b, h, win, dh), kv_dtype)
    if int8:
        cross_k, ck_s = _q8_rows(cross_k)  # (L,B,H,T,dh) int8, (L,B,H,T)
        cross_v, cv_s = _q8_rows(cross_v)
        sc0 = {"k_s": jnp.ones((L, b, h, win), jnp.float32),
               "v_s": jnp.ones((L, b, h, win), jnp.float32),
               "cross_k_s": ck_s, "cross_v_s": cv_s}

        def step(carry, i):
            tok, ks, vs, sc = carry
            logits, ks, vs, sc = whisper_decode_token(
                p, cfg, tok, i, ks, vs, cross_k, cross_v, scales=sc)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (nxt, ks, vs, sc), nxt

        tok0 = jnp.full((b,), bos_token, jnp.int32)
        _, outs = jax.lax.scan(step, (tok0, k0, v0, sc0),
                               jnp.arange(max_tokens))
        return outs.T

    def step(carry, i):
        tok, ks, vs = carry
        logits, ks, vs = whisper_decode_token(p, cfg, tok, i, ks, vs,
                                              cross_k, cross_v)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        return (nxt, ks, vs), nxt

    tok0 = jnp.full((b,), bos_token, jnp.int32)
    _, outs = jax.lax.scan(step, (tok0, k0, v0), jnp.arange(max_tokens))
    return outs.T


def whisper_transcribe_auto(
    model,
    params,
    mel: Array,
    bos_token: int,
    max_tokens: int,
    kv_dtype=jnp.float32,
) -> Array:
    """Shape-aware Whisper decode dispatch (greedy; same outputs either
    way — the cached path is exact for Whisper, tests/test_generate.py).

    At short text contexts the sequential cached loop LOSES to re-running
    the full decoder window each step: its per-step latency is dominated
    by dispatch overhead and narrow (B, 1, C) matmuls while the full
    window is one well-tiled batched matmul — measured 0.8x at ctx 128 on
    v5e (benchmarks/decode.md). The crossover is
    ``config.whisper_cached_min_ctx`` (env
    MOP_TPU_WHISPER_CACHED_MIN_CTX), the same measured-dispatch policy as
    the flash/multihop kernels (mop_tpu/config.py).

    ``kv_dtype`` only affects the cached branch (the full-window decoder
    has no KV cache to store)."""
    from ..config import whisper_cached_min_ctx

    if max_tokens < whisper_cached_min_ctx():
        return whisper_transcribe(model, params, mel, bos_token, max_tokens)
    return whisper_transcribe_cached(model, params, mel, bos_token,
                                     max_tokens, kv_dtype=kv_dtype)
