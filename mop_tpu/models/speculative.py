"""Speculative decoding for the GPT family (beyond-reference capability).

A small draft model proposes ``gamma`` tokens per round with its own KV
cache; the target model verifies all of them in ONE chunked cached forward
(:func:`mop_tpu.models.generate.decode_chunk`) and accepts a prefix plus
one correction/bonus token:

- **greedy** (``temperature == 0`` or no rng): accept while the draft token
  equals the target argmax. The output is **provably identical** to running
  the target alone with ``generate_cached`` — every emitted token is the
  target's own argmax given the same prefix — so the draft model only
  affects speed, never content (equality pinned in
  tests/test_speculative.py).
- **sampled** (``temperature > 0``): accept draft token ``d`` with
  probability ``min(1, p(d)/q(d))``; on rejection resample from the
  residual ``max(p - q, 0)`` (renormalized), and when every draft is
  accepted sample the bonus token from the target distribution — the
  standard speculative-sampling construction, whose emitted sequence is
  distributed EXACTLY as target-only sampling for any draft
  (:func:`verify_sampled`; marginal-distribution equality pinned
  empirically in tests).

The reference (Eran-BA/MoP) has no generation loop at all (SURVEY §0,
``mop/models/gpt_mop.py:181-207``); this module is part of the serving
layer the TPU rebuild adds. TinyTransformerLM-family targets only (same
constraint as ``generate_cached``: the quartet/standardized attention's
cached form). Works with int8-quantized params for either model.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .generate import decode_chunk, decode_step, prefill

Array = jax.Array


def verify_sampled(key: Array, p_all: Array, q: Array, d: Array):
    """Speculative-sampling accept/resample verification.

    p_all: (g+1, V) target probabilities at each draft position plus the
    bonus position; q: (g, V) draft probabilities; d: (g,) draft tokens.
    Accepts ``d_i`` while ``u_i < p_i(d_i)/q_i(d_i)``; the correction token
    comes from the renormalized residual ``max(p_n - q_n, 0)`` at the first
    rejection (with ``q := 0`` at the bonus position, i.e. sample from the
    target there). Returns (n_acc, correction_token).

    The marginal law of each emitted token is exactly ``p`` — for one
    position: ``P(t) = q(t)·min(1, p(t)/q(t)) + P(reject)·r(t) = p(t)``
    with ``r ∝ max(p-q, 0)`` — pinned empirically in
    tests/test_speculative.py over 20k keys.
    """
    g = d.shape[0]
    ku, kc = jax.random.split(key)
    u = jax.random.uniform(ku, (g,))
    idx = jnp.arange(g)
    ratio = p_all[idx, d] / jnp.maximum(q[idx, d], 1e-30)
    acc = (u < ratio).astype(jnp.int32)
    n_acc = jnp.sum(jnp.cumprod(acc))
    q_ext = jnp.concatenate([q, jnp.zeros_like(q[:1])], axis=0)
    p_n = p_all[n_acc]
    r = jnp.maximum(p_n - q_ext[n_acc], 0.0)
    rsum = jnp.sum(r)
    # p <= q everywhere can only happen when p == q on the support (both
    # normalized); fall back to sampling p directly.
    r = jnp.where(rsum > 1e-30, r / rsum, p_n)
    corr = jax.random.categorical(kc, jnp.log(r + 1e-30)).astype(jnp.int32)
    return n_acc, corr


def speculative_generate(
    target_model,
    target_params,
    draft_model,
    draft_params,
    prompt: Array,
    max_new_tokens: int,
    gamma: int = 4,
    rng: Optional[Array] = None,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    return_stats: bool = False,
    kv_dtype=jnp.float32,
):
    """Speculative decode. prompt: (1, T0) -> (1, T0 + max_new_tokens).

    Greedy when ``temperature == 0`` or no rng is given (token-identical to
    ``generate_cached``); otherwise distribution-preserving speculative
    sampling at the given temperature/top_k (see module docstring). With
    ``top_k`` both draft and target distributions are top-k filtered, so
    the preserved law is the filtered target's — the same convention as
    ``generate_cached``.

    ``gamma`` is the number of draft tokens proposed per round. Each round
    costs ``gamma`` (+1 when all are accepted) draft steps plus ONE target
    forward over ``gamma + 1`` positions, and emits between 1 and
    ``gamma + 1`` tokens — so with an agreeable draft the target runs
    ~``(gamma+1)x`` fewer times.

    Batch size must be 1 (rows would accept different lengths, but the KV
    caches advance by a single shared ``len``); vmap externally if needed.
    Requires ``T0 + max_new_tokens + gamma <= block_size`` of BOTH models:
    verify chunks may write up to ``gamma`` rows past the final length
    (rolled back by resetting ``len``; the rows are overwritten later).

    With ``return_stats=True`` also returns a dict with ``rounds``,
    ``drafted`` and ``accepted`` counts (acceptance rate =
    ``accepted / drafted``).

    ``kv_dtype``: storage dtype of BOTH models' KV caches —
    ``jnp.bfloat16`` halves and ``jnp.int8`` quarters the cache HBM
    exactly as in :func:`generate_cached` (the verify pass consumes the
    int8 layout via ``decode_chunk``'s scale-folded dots). Greedy
    speculative output remains token-identical to ``generate_cached``
    AT THE SAME ``kv_dtype`` (the quantization perturbs the target's
    logits identically on both paths; pinned in
    tests/test_speculative_matrix.py).

    GPT_MoP targets/drafts: supported with the same contract as
    ``generate_cached`` — EXACT for ``create_gpt_mop_causal`` models
    (gate taps <= pos, so the verify chunk's rollback never exposes
    stale view rows), frontier-approximate for the reference-exact
    non-causal gate (see generate.py's module comment and
    benchmarks/mop_decode.md).
    """
    b, t0 = prompt.shape
    if b != 1:
        raise ValueError(f"speculative_generate requires batch 1, got {b}")
    if gamma < 1:
        raise ValueError(f"gamma must be >= 1, got {gamma}")
    for name, m in (("target", target_model), ("draft", draft_model)):
        if t0 + max_new_tokens + gamma > m.config.block_size:
            raise ValueError(
                f"T0 + max_new_tokens + gamma = {t0 + max_new_tokens + gamma}"
                f" exceeds {name} block_size {m.config.block_size}")

    greedy = rng is None or temperature == 0.0
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def _dist(logits):
        scaled = logits / jnp.maximum(temperature, 1e-6)
        if top_k is not None:
            kth = jnp.sort(scaled, -1)[..., -top_k][..., None]
            scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
        return jax.nn.softmax(scaled, axis=-1)

    prompt = prompt.astype(jnp.int32)
    logits0, tcache = prefill(target_model, target_params, prompt,
                              kv_dtype=kv_dtype)
    _, dcache = prefill(draft_model, draft_params, prompt,
                        kv_dtype=kv_dtype)
    if greedy:
        first = jnp.argmax(logits0, -1).astype(jnp.int32)  # (1,)
    else:
        rng, k0 = jax.random.split(rng)
        first = jax.random.categorical(
            k0, jnp.log(_dist(logits0) + 1e-30)).astype(jnp.int32)

    total = max_new_tokens
    # Slack for the last round's overshoot; trimmed on return.
    buf = jnp.zeros((total + gamma + 1,), jnp.int32).at[0].set(first[0])

    def dstep(carry, _):
        tok, dc, key = carry
        logits, dc = decode_step(draft_model, draft_params, dc, tok)
        if greedy:
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            qrow = jnp.zeros_like(logits[0])
        else:
            key, k1 = jax.random.split(key)
            qrow = _dist(logits)[0]
            nxt = jax.random.categorical(
                k1, jnp.log(qrow + 1e-30)[None]).astype(jnp.int32)
        return (nxt, dc, key), (nxt, qrow)

    def cond(c):
        return c[1] < total

    def body(c):
        buf, n_out, last, tc, dc, key, rounds, accepted = c
        key, kd, kv = jax.random.split(key, 3)
        (d_last, dc2, _), (drafts, qrows) = jax.lax.scan(
            dstep, (last, dc, kd), None, length=gamma)
        d = drafts[:, 0]  # (gamma,)

        # One target forward verifies every draft position at once.
        chunk = jnp.concatenate([last, d])[None]  # (1, gamma+1)
        logits, tc2 = decode_chunk(target_model, target_params, tc, chunk)

        if greedy:
            tpred = jnp.argmax(logits[0], -1).astype(jnp.int32)
            match = (tpred[:gamma] == d).astype(jnp.int32)
            n_acc = jnp.sum(jnp.cumprod(match))  # longest matching prefix
            corr = tpred[n_acc]
        else:
            p_all = _dist(logits[0])  # (gamma+1, V)
            n_acc, corr = verify_sampled(kv, p_all, qrows, d)

        # Only when ALL gamma drafts are accepted does the next round start
        # after d_{gamma-1}, whose K/K2/V row was never written (the scan
        # fed [last, d_0..d_{gamma-2}]) — feed it now, in that case only.
        dc2 = jax.lax.cond(
            n_acc == gamma,
            lambda c_: decode_step(draft_model, draft_params, c_, d_last)[1],
            lambda c_: c_,
            dc2)
        # Emit d_0..d_{n_acc-1} then the correction/bonus token.
        i = jnp.arange(gamma + 1)
        d_ext = jnp.concatenate([d, d[-1:]])
        emit = jnp.where(i < n_acc, d_ext, corr)
        idx = n_out + i
        buf2 = buf.at[idx].set(jnp.where(i <= n_acc, emit, buf[idx]))

        # Roll back both caches to the accepted prefix: [last, d_0..d_{n_acc-1}]
        # were truly fed; rows past that get overwritten next round.
        tc2 = dict(tc2, len=tc["len"] + n_acc + 1)
        dc2 = dict(dc2, len=dc["len"] + n_acc + 1)
        return (buf2, n_out + n_acc + 1, corr[None], tc2, dc2, key,
                rounds + 1, accepted + n_acc)

    zero = jnp.zeros((), jnp.int32)
    carry = (buf, jnp.ones((), jnp.int32), first, tcache, dcache, rng,
             zero, zero)
    buf, n_out, _, _, _, _, rounds, accepted = jax.lax.while_loop(
        cond, body, carry)

    out = jnp.concatenate([prompt, buf[None, :total]], axis=1)
    if return_stats:
        return out, {
            "rounds": rounds,
            "drafted": rounds * gamma,
            "accepted": accepted,
        }
    return out
