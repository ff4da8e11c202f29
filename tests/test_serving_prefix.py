"""Prefix caching in the serving engine.

Contract: with ``prefix_cache_entries`` set, emitted tokens are IDENTICAL
to the plain engine's for any request mix — prefix reuse is exact because
a position's K/K2/V rows and row statistics depend only on the tokens at
or before it (prefix standardization), so rows shared between prompts are
bit-identical whatever follows. The reference has no serving or caching
story at all (SURVEY §0).
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_baseline, \
    create_gpt_quartet
from mop_tpu.serving import DecodeEngine

VOCAB = 50


def _build(factory=create_gpt_quartet, block=64):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=block)
    model = factory(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


def _run(model, params, jobs, **kw):
    eng = DecodeEngine(model, params, max_batch=3, **kw)
    rids = [eng.submit(*j) for j in jobs]
    res = eng.run()
    return [res[r] for r in rids], eng


SYS = [7, 3, 9, 1, 4, 4, 2, 8, 6, 5, 1, 0]  # shared "system prompt"

JOBS = [
    (SYS + [13, 21], 10),          # first: cold, populates the cache
    (SYS + [13, 21], 8),           # exact-duplicate prompt
    (SYS + [2, 30, 17], 12),       # shares only SYS
    (SYS[:5], 6),                  # prefix OF a cached prompt
    ([42, 41, 40], 6),             # no shared prefix at all
    (SYS + [13, 21, 5, 5], 8),     # extends a cached prompt
]


@pytest.mark.parametrize("factory", [create_gpt_quartet, create_gpt_baseline])
def test_prefix_cache_token_equality(factory):
    model, params = _build(factory)
    plain, _ = _run(model, params, JOBS)
    cached, eng = _run(model, params, JOBS, prefix_cache_entries=8)
    assert cached == plain
    assert eng.prefix_cache_hits >= 4
    # the duplicate alone reuses len(SYS)+1 tokens (capped at len-1)
    assert eng.prefix_tokens_reused >= len(SYS) + 1


def test_prefix_cache_with_buckets_and_sampling():
    """Prefix reuse composes with bucketed prefill; sampled decode stays
    distribution-valid (same rng stream -> same tokens as plain engine)."""
    model, params = _build()
    kw = dict(temperature=0.8, top_k=8)
    plain, _ = _run(model, params, JOBS,
                    rng=jax.random.PRNGKey(7), **kw)
    cached, eng = _run(model, params, JOBS, rng=jax.random.PRNGKey(7),
                       prefill_buckets=[8, 16, 32],
                       prefix_cache_entries=4, **kw)
    assert cached == plain
    assert eng.prefix_cache_hits >= 4


def test_prefix_cache_lru_eviction():
    model, params = _build()
    eng = DecodeEngine(model, params, max_batch=2, prefix_cache_entries=1)
    a, b = [1, 2, 3, 4, 5, 6], [9, 8, 7, 6, 5, 4]
    for p in (a, b, a):  # b evicts a; the second a must miss
        rid = eng.submit(p, 4)
        eng.run()
        assert eng.is_done(rid)
    assert len(eng._prefix_lru) == 1
    assert eng.prefix_cache_hits == 0
    # now a is cached again: immediate re-submit hits
    eng.submit(a, 4)
    eng.run()
    assert eng.prefix_cache_hits == 1


def test_prefix_cache_in_spec_engine():
    """Speculative engine + prefix cache still emits exact tokens (the
    draft prefills fully; only the target reuses prefix rows)."""
    from mop_tpu.serving import SpecDecodeEngine

    model, params = _build()
    dmodel, dparams = _build()  # any draft is sound for greedy spec
    plain, _ = _run(model, params, JOBS)
    eng = SpecDecodeEngine(model, params, dmodel, dparams, max_batch=3,
                           gamma=3, prefix_cache_entries=8)
    rids = [eng.submit(*j) for j in JOBS]
    res = eng.run()
    assert [res[r] for r in rids] == plain
    assert eng.prefix_cache_hits >= 4


def test_prefix_cache_equality_vs_single_stream():
    """Cached-engine greedy output equals generate_cached exactly."""
    from mop_tpu.models import generate_cached

    model, params = _build()
    prompt = SYS + [13, 21]
    # warm the prefix cache with a different same-prefix request first
    eng = DecodeEngine(model, params, max_batch=2, prefix_cache_entries=4)
    eng.submit(SYS + [30], 6)
    eng.run()
    rid = eng.submit(prompt, 10)
    eng.run()
    assert eng.prefix_cache_hits >= 1
    ref = np.asarray(generate_cached(
        model, params, jnp.asarray([prompt], jnp.int32),
        max_new_tokens=10))[0, len(prompt):]
    assert eng.results[rid] == list(ref)
