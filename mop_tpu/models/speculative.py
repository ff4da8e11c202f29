"""Speculative decoding for the GPT family (beyond-reference capability).

A small draft model proposes ``gamma`` tokens per round with its own KV
cache; the target model verifies all of them in ONE chunked cached forward
(:func:`mop_tpu.models.generate.decode_chunk`) and accepts the longest
matching prefix plus one correction/bonus token. Under greedy decoding the
output is **provably identical** to running the target alone with
``generate_cached`` — every emitted token is the target's own argmax given
the same prefix — so the draft model only affects speed, never content
(equality pinned in tests/test_speculative.py).

The reference (Eran-BA/MoP) has no generation loop at all (SURVEY §0,
``mop/models/gpt_mop.py:181-207``); this module is part of the serving
layer the TPU rebuild adds. TinyTransformerLM-family targets only (same
constraint as ``generate_cached``: the quartet/standardized attention's
cached form). Works with int8-quantized params for either model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .generate import decode_chunk, decode_step, prefill

Array = jax.Array


def speculative_generate(
    target_model,
    target_params,
    draft_model,
    draft_params,
    prompt: Array,
    max_new_tokens: int,
    gamma: int = 4,
    return_stats: bool = False,
):
    """Greedy speculative decode. prompt: (1, T0) -> (1, T0 + max_new_tokens).

    ``gamma`` is the number of draft tokens proposed per round. Each round
    costs ``gamma + 1`` draft steps plus ONE target forward over
    ``gamma + 1`` positions, and emits between 1 and ``gamma + 1`` tokens —
    so with an agreeable draft the target runs ~``(gamma+1)x`` fewer times.

    Batch size must be 1 (rows would accept different lengths, but the KV
    caches advance by a single shared ``len``); vmap externally if needed.
    Requires ``T0 + max_new_tokens + gamma <= block_size`` of BOTH models:
    verify chunks may write up to ``gamma`` rows past the final length
    (rolled back by resetting ``len``; the rows are overwritten later).

    With ``return_stats=True`` also returns a dict with ``rounds``,
    ``drafted`` and ``accepted`` counts (acceptance rate =
    ``accepted / drafted``).
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

    prompt = prompt.astype(jnp.int32)
    logits0, tcache = prefill(target_model, target_params, prompt)
    _, dcache = prefill(draft_model, draft_params, prompt)
    first = jnp.argmax(logits0, -1).astype(jnp.int32)  # (1,)

    total = max_new_tokens
    # Slack for the last round's overshoot; trimmed on return.
    buf = jnp.zeros((total + gamma + 1,), jnp.int32).at[0].set(first[0])

    def dstep(carry, _):
        tok, dc = carry
        logits, dc = decode_step(draft_model, draft_params, dc, tok)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        return (nxt, dc), nxt

    def cond(c):
        return c[1] < total

    def body(c):
        buf, n_out, last, tc, dc, rounds, accepted = c
        (d_last, dc2), drafts = jax.lax.scan(
            dstep, (last, dc), None, length=gamma)
        d = drafts[:, 0]  # (gamma,)

        # One target forward verifies every draft position at once.
        chunk = jnp.concatenate([last, d])[None]  # (1, gamma+1)
        logits, tc2 = decode_chunk(target_model, target_params, tc, chunk)
        tpred = jnp.argmax(logits[0], -1).astype(jnp.int32)  # (gamma+1,)

        match = (tpred[:gamma] == d).astype(jnp.int32)
        n_acc = jnp.sum(jnp.cumprod(match))  # longest matching prefix

        # Only when ALL gamma drafts are accepted does the next round start
        # after d_{gamma-1}, whose K/K2/V row was never written (the scan
        # fed [last, d_0..d_{gamma-2}]) — feed it now, in that case only.
        dc2 = jax.lax.cond(
            n_acc == gamma,
            lambda c_: decode_step(draft_model, draft_params, c_, d_last)[1],
            lambda c_: c_,
            dc2)
        # Emit d_0..d_{n_acc-1} then the target's correction/bonus token.
        i = jnp.arange(gamma + 1)
        d_ext = jnp.concatenate([d, d[-1:]])
        emit = jnp.where(i < n_acc, d_ext, tpred[n_acc])
        idx = n_out + i
        buf2 = buf.at[idx].set(jnp.where(i <= n_acc, emit, buf[idx]))

        # Roll back both caches to the accepted prefix: [last, d_0..d_{n_acc-1}]
        # were truly fed; rows past that get overwritten next round.
        tc2 = dict(tc2, len=tc["len"] + n_acc + 1)
        dc2 = dict(dc2, len=dc["len"] + n_acc + 1)
        return (buf2, n_out + n_acc + 1, tpred[n_acc][None], tc2, dc2,
                rounds + 1, accepted + n_acc)

    zero = jnp.zeros((), jnp.int32)
    carry = (buf, jnp.ones((), jnp.int32), first, tcache, dcache, zero, zero)
    buf, n_out, _, _, _, rounds, accepted = jax.lax.while_loop(
        cond, body, carry)

    out = jnp.concatenate([prompt, buf[None, :total]], axis=1)
    if return_stats:
        return out, {
            "rounds": rounds,
            "drafted": rounds * gamma,
            "accepted": accepted,
        }
    return out
