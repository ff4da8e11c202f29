"""Evaluation metrics: LM perplexity, WER/CER, top-k accuracy.

Beyond-reference capability — the reference reports only plain accuracy
from hand-written eval loops (e.g. ``cifar100_ab5_param_budgets.py:165-175``)
and has no LM or ASR evaluation at all. The device-side pieces (NLL,
top-k) are jittable; the sequence-alignment pieces (WER/CER) are host-side
dynamic programming over already-decoded outputs, where XLA buys nothing.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ------------------------------ perplexity ------------------------------

def lm_nll(model, params, tokens: Array, mask: Array = None) -> Array:
    """Mean next-token negative log-likelihood of (B, T) int tokens under a
    GPT-family model (teacher-forced: positions 0..T-2 predict 1..T-1).
    ``mask``: optional (B, T) validity mask (1 = real token); a target is
    counted only if its position is valid. Returns a scalar (nats)."""
    inp, tgt = tokens[:, :-1], tokens[:, 1:]
    logits, _ = model.apply(params, inp, train=False)
    logp = jax.nn.log_softmax(logits, -1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]  # (B, T-1)
    if mask is None:
        return nll.mean()
    m = mask[:, 1:].astype(nll.dtype)
    return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)


def lm_perplexity(model, params, tokens, batch_size: int = 32,
                  mask=None) -> Tuple[float, float]:
    """Corpus perplexity of (N, T) tokens, evaluated in jitted batches.

    Returns ``(perplexity, mean_nll_nats)``. The per-batch NLL is jitted
    once and reused; a trailing partial batch is padded by repetition and
    masked out of the average (exact token-weighted mean)."""
    tokens = jnp.asarray(tokens, jnp.int32)
    n = tokens.shape[0]
    if mask is None:
        mask = jnp.ones(tokens.shape, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)

    @jax.jit
    def batch_stats(tok, m):
        inp, tgt = tok[:, :-1], tok[:, 1:]
        logits, _ = model.apply(params, inp, train=False)
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        mm = m[:, 1:]
        return (nll * mm).sum(), mm.sum()

    total, count = 0.0, 0.0
    for i in range(0, n, batch_size):
        tok = tokens[i:i + batch_size]
        m = mask[i:i + batch_size]
        if tok.shape[0] < batch_size:  # pad by repetition, zero the mask
            pad = batch_size - tok.shape[0]
            tok = jnp.concatenate([tok, jnp.tile(tok[:1], (pad, 1))], 0)
            m = jnp.concatenate([m, jnp.zeros((pad, m.shape[1]))], 0)
        s, c = batch_stats(tok, m)
        total += float(s)
        count += float(c)
    nll = total / max(count, 1.0)
    return math.exp(nll), nll


# ------------------------------ WER / CER ------------------------------

def _edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance (substitution/insertion/deletion, unit costs),
    O(len(ref) * len(hyp)) with a two-row table."""
    nr, nh = len(ref), len(hyp)
    if nr == 0:
        return nh
    prev = np.arange(nh + 1)
    for i in range(1, nr + 1):
        cur = np.empty(nh + 1, np.int64)
        cur[0] = i
        for j in range(1, nh + 1):
            sub = prev[j - 1] + (ref[i - 1] != hyp[j - 1])
            cur[j] = min(sub, prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return int(prev[nh])


def wer(refs: Union[str, Sequence], hyps: Union[str, Sequence]) -> float:
    """Word error rate. Accepts a single pair or parallel lists; strings
    are split on whitespace, other sequences (e.g. token-id lists) are
    aligned as-is. Corpus WER = total edits / total reference length."""
    if isinstance(refs, str) or (refs and not isinstance(refs[0],
                                                         (list, str,
                                                          tuple,
                                                          np.ndarray))):
        refs, hyps = [refs], [hyps]
    edits, length = 0, 0
    for r, h in zip(refs, hyps):
        r = r.split() if isinstance(r, str) else list(r)
        h = h.split() if isinstance(h, str) else list(h)
        edits += _edit_distance(r, h)
        length += len(r)
    if length == 0:
        raise ValueError("wer: empty reference")
    return edits / length


def cer(refs: Union[str, List[str]], hyps: Union[str, List[str]]) -> float:
    """Character error rate over strings (whitespace counts as a char)."""
    if isinstance(refs, str):
        refs, hyps = [refs], [hyps]
    edits = sum(_edit_distance(list(r), list(h))
                for r, h in zip(refs, hyps))
    length = sum(len(r) for r in refs)
    if length == 0:
        raise ValueError("cer: empty reference")
    return edits / length


# ------------------------------ top-k accuracy ------------------------------

def topk_accuracy(logits: Array, labels: Array, k: int = 1) -> Array:
    """Fraction of rows whose label is among the k highest logits
    (ties broken by index order, matching ``lax.top_k``). Jittable."""
    _, idx = jax.lax.top_k(logits, k)
    hit = (idx == labels[:, None]).any(-1)
    return hit.mean()
