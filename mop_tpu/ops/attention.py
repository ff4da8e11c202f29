"""Functional attention-score algebra — the mathematical core of MoP.

Pure JAX functions implementing the pre-softmax boolean score logic of the
reference's attention variants (reference ``mop/models/attention_variants.py``):

- masked softmax with -inf re-masking before every softmax
- pairwise / stacked logsumexp (the OR operation in score space)
- chained attention products ``A_1 @ A_2 @ ... @ A_M`` (the CHAIN operation)
- the D-mode (MultiHop) and E-mode (Edgewise) logit mixers

Everything here is shape-static and jit/vmap-friendly; these functions are the
reference semantics that the fused Pallas kernels in ``mop_tpu.ops.fused``
must reproduce (and are the fallback path on non-TPU backends).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = float("-inf")


def apply_mask(scores: Array, mask: Optional[Array]) -> Array:
    """Set score entries to -inf where ``mask == 0``.

    Matches reference ``attention_variants.py:113-118`` (masked_fill semantics);
    ``mask`` broadcasts against ``scores``.
    """
    if mask is None:
        return scores
    return jnp.where(mask == 0, NEG_INF, scores)


def masked_softmax(scores: Array, mask: Optional[Array] = None, axis: int = -1) -> Array:
    """Softmax with optional -inf masking applied first."""
    return jax.nn.softmax(apply_mask(scores, mask), axis=axis)


def scaled_scores(q: Array, k: Array) -> Array:
    """``S = q @ k^T / sqrt(dk)`` over trailing (..., N, dk) axes, fp32 accumulation."""
    dk = q.shape[-1]
    s = jnp.einsum("...nd,...md->...nm", q, k, preferred_element_type=jnp.float32)
    return s * (1.0 / jnp.sqrt(jnp.asarray(dk, dtype=s.dtype)))


def lse_pair(a: Array, b: Array) -> Array:
    """Elementwise log(exp(a)+exp(b)) — score-space OR (reference :159-160)."""
    return jnp.logaddexp(a, b)


def lse_stack(scores: Sequence[Array]) -> Array:
    """Elementwise logsumexp over a list of score maps (reference :541)."""
    return jax.scipy.special.logsumexp(jnp.stack(scores, axis=0), axis=0)


def chain_product(attn_list: Sequence[Array]) -> Array:
    """``A_1 @ A_2 @ ... @ A_M`` — multi-hop transition composition (:508-512)."""
    c = attn_list[0]
    for a in attn_list[1:]:
        c = jnp.einsum("...nk,...km->...nm", c, a, preferred_element_type=jnp.float32)
    return c


def multihop_logit_mix(
    s1: Array,
    s2: Array,
    c_fwd: Array,
    gates: dict,
    beta_not: float,
    eps: float = 1e-6,
) -> Array:
    """D-mode logit algebra (reference ``attention_variants.py:209-218``).

    ``Smix = S1 + g_and*S2 + g_or*(LSE(S1,S2)-S1) - g_not*beta*S2
             + g_chain*log(C_fwd+eps)``
    """
    smix = s1
    smix = smix + gates.get("and_", 1.0) * s2
    smix = smix + gates.get("or_", 0.0) * (lse_pair(s1, s2) - s1)
    smix = smix - gates.get("not_", 0.0) * (beta_not * s2)
    smix = smix + gates.get("chain", 0.0) * jnp.log(c_fwd + eps)
    return smix


def edgewise_logit_mix(
    s_list: Sequence[Array],
    g_and: Array,
    g_or: Array,
    g_not: Array,
    g_chain: Array,
    log_c_fwd: Array,
    beta_not: float,
) -> Array:
    """E-mode per-edge gated logit algebra (reference :537-547).

    All inputs broadcast over (..., N, N). ``g_*`` are per-edge gates in [0,1].
    """
    s1 = s_list[0]
    num_s = len(s_list)
    s_sum = s1
    for s in s_list[1:]:
        s_sum = s_sum + s
    lse_all = lse_stack(list(s_list))
    s_mean_others = (s_sum - s1) / max(1, num_s - 1)
    smix = s1
    smix = smix + g_and * (s_sum - s1)
    smix = smix + g_or * (lse_all - s1)
    smix = smix - g_not * (beta_not * s_mean_others)
    smix = smix + g_chain * log_c_fwd
    return smix


def standardize_scores(scores: Array, eps: float = 1e-5) -> Array:
    """Per-row score standardization with *unbiased* std (Quartet attention).

    Matches reference ``quartet_attn_patch.py:95-98`` which uses torch's
    default unbiased (N-1) standard deviation.
    """
    mu = jnp.mean(scores, axis=-1, keepdims=True)
    n = scores.shape[-1]
    var = jnp.sum(jnp.square(scores - mu), axis=-1, keepdims=True) / max(1, n - 1)
    sigma = jnp.sqrt(var)
    return (scores - mu) / (sigma + eps)


def standardize_scores_causal(scores: Array, eps: float = 1e-5) -> Array:
    """Per-row standardization over each row's CAUSAL PREFIX (columns <= row
    index) with unbiased (N-1) std.

    This is the causal-decode-exact variant of :func:`standardize_scores`:
    the reference standardizes over ALL columns before masking
    (``quartet_attn_patch.py:95-98``), which makes every position's
    activations depend on future keys and forces full-window resampling.
    Restricting the statistics to the causal prefix makes position i a
    function of tokens <= i only, so an incremental KV cache reproduces the
    full forward bit-for-bit (the ``causal_std`` serving variant;
    tests/test_gpt_mop_serving.py pins the equality).

    scores: (..., N, N). Row i's mean/std use columns 0..i (i+1 columns).
    """
    n = scores.shape[-1]
    rows = jnp.arange(n)[:, None]
    live = jnp.arange(n)[None, :] <= rows  # (N, N) lower-tri inclusive
    cnt = (rows + 1).astype(jnp.float32)
    mu = jnp.sum(jnp.where(live, scores, 0.0), -1, keepdims=True) / cnt
    var = jnp.sum(jnp.where(live, jnp.square(scores - mu), 0.0), -1,
                  keepdims=True) / jnp.maximum(cnt - 1.0, 1.0)
    # Row 0's prefix is a single element, so var == 0 EXACTLY and
    # d(sqrt)/d(var) is infinite — a plain sqrt NaNs every training
    # gradient. Safe form: the output there is 0 anyway (s == mu), so
    # route the sqrt through a clamped argument; forward is unchanged.
    sigma = jnp.sqrt(jnp.where(var > 0.0, var, 1.0))
    return jnp.where(var > 0.0, (scores - mu) / (sigma + eps), 0.0)


def attend(
    q: Array,
    k: Array,
    v: Array,
    mask: Optional[Array] = None,
) -> Array:
    """Plain scaled-dot-product attention (reference BaselineMSA :36-48).

    q,k,v: (..., N, dk). Returns (..., N, dk). Softmax in fp32.
    """
    s = scaled_scores(q, k)
    a = masked_softmax(s, mask)
    return jnp.einsum(
        "...nm,...md->...nd", a.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


def causal_mask(n: int, dtype=jnp.bool_) -> Array:
    """Lower-triangular (1,1,N,N) causal mask (reference quartet :67-73)."""
    return jnp.tril(jnp.ones((n, n), dtype=dtype))[None, None]
