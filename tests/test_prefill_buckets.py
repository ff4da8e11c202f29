"""Bucketed exact prefill: pad-to-bucket admission with masked statistics.

`prefill_padded` must match the dense `prefill` on the live region (same
logits, same cache rows) with the pad length traced — one jit compile per
bucket instead of one per distinct prompt length — and the serving engines
must emit identical tokens with bucketing on.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_quartet
from mop_tpu.models.generate import prefill, prefill_padded
from mop_tpu.serving import DecodeEngine, SpecDecodeEngine

VOCAB = 50


def _model(n_layer=2, n_embd=32, seed=1, use_quartet=True):
    cfg = TransformerConfig(n_layer=n_layer, n_head=2, n_embd=n_embd,
                            dropout=0.0, block_size=64,
                            use_quartet=use_quartet)
    model = create_gpt_quartet(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 8), jnp.int32))
    return model, params


@pytest.mark.parametrize("use_quartet", [True, False])
@pytest.mark.parametrize("t0", [1, 3, 7, 16])
def test_prefill_padded_matches_dense_prefill(use_quartet, t0):
    model, params = _model(use_quartet=use_quartet)
    prompt = jax.random.randint(jax.random.PRNGKey(2), (2, t0), 0, VOCAB)
    ref_logits, ref_cache = prefill(model, params, prompt)

    t_pad = 16
    padded = jnp.zeros((2, t_pad), jnp.int32).at[:, :t0].set(prompt)
    logits, cache = prefill_padded(model, params, padded, t0)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=1e-5, atol=1e-5)
    assert int(cache["len"]) == int(ref_cache["len"]) == t0
    for k in ("k", "k2", "v"):
        np.testing.assert_allclose(
            np.asarray(cache[k][:, :, :, :t0]),
            np.asarray(ref_cache[k][:, :, :, :t0]), rtol=1e-5, atol=1e-6)


def _jobs():
    return [([3, 1, 4, 1, 5], 10), ([2, 7], 8), ([11, 9, 8, 7, 6, 5, 4], 6),
            ([1], 9)]


def _run(engine):
    rids = [engine.submit(*j) for j in _jobs()]
    res = engine.run()
    return [res[r] for r in rids]


def test_engine_buckets_same_tokens_one_compile_per_bucket():
    model, params = _model()
    ref = _run(DecodeEngine(model, params, max_batch=3))
    eng = DecodeEngine(model, params, max_batch=3,
                       prefill_buckets=[8, 16])
    assert _run(eng) == ref
    # 4 distinct prompt lengths but at most 2 padded-prefill compiles
    assert eng._adm_padded_fn._cache_size() <= 2


def test_spec_engine_buckets_same_tokens():
    target, tparams = _model(n_layer=3, seed=1)
    draft, dparams = _model(n_layer=1, n_embd=16, seed=7)
    ref = _run(SpecDecodeEngine(target, tparams, draft, dparams,
                                max_batch=3, gamma=3))
    out = _run(SpecDecodeEngine(target, tparams, draft, dparams,
                                max_batch=3, gamma=3,
                                prefill_buckets=[8, 16]))
    assert out == ref


def test_engine_bucket_validation():
    model, params = _model()
    with pytest.raises(ValueError, match="bucket"):
        DecodeEngine(model, params, prefill_buckets=[128])
