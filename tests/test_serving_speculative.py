"""Speculative continuous batching (beyond-reference serving layer).

Two contracts: (1) `decode_chunk_rows` over G tokens is exactly the
composition of G `decode_step_rows` calls at per-row positions, and
(2) `SpecDecodeEngine` (draft-proposed, target-verified, greedy) emits the
SAME tokens as the plain `DecodeEngine` for every request in a mixed
continuous batch — the draft model changes only the number of target
passes, never the output.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_quartet
from mop_tpu.models.generate import init_decode_cache, prefill
from mop_tpu.serving import (DecodeEngine, SpecDecodeEngine,
                             decode_chunk_rows, decode_step_rows)

VOCAB = 50


def _model(n_layer=2, n_embd=32, block=64, seed=1, use_quartet=True):
    cfg = TransformerConfig(n_layer=n_layer, n_head=2, n_embd=n_embd,
                            dropout=0.0, block_size=block,
                            use_quartet=use_quartet)
    model = create_gpt_quartet(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 8), jnp.int32))
    return model, params


@pytest.mark.parametrize("use_quartet", [True, False])
def test_decode_chunk_rows_equals_sequential_steps(use_quartet):
    """Rows at DIFFERENT positions, advanced 3 tokens each: chunked ==
    sequential, logits and cache."""
    model, params = _model(use_quartet=use_quartet)
    cache = init_decode_cache(model.config, 2)
    cache["len"] = jnp.zeros((2,), jnp.int32)
    # paste two different-length prefills into the pool
    for slot, plen in ((0, 4), (1, 7)):
        prompt = jax.random.randint(jax.random.PRNGKey(slot), (1, plen),
                                    0, VOCAB)
        _, pc = prefill(model, params, prompt)
        for k in ("k", "k2", "v"):
            cache[k] = cache[k].at[:, slot].set(pc[k][:, 0])
        cache["len"] = cache["len"].at[slot].set(plen)

    toks = jax.random.randint(jax.random.PRNGKey(9), (2, 3), 0, VOCAB)
    seq_cache = dict(cache)
    seq_logits = []
    for g in range(3):
        lg, seq_cache = decode_step_rows(model, params, seq_cache,
                                         toks[:, g], seq_cache["len"])
        seq_logits.append(lg)
    seq_logits = jnp.stack(seq_logits, axis=1)

    chunk_logits, chunk_cache = decode_chunk_rows(model, params, cache,
                                                  toks, cache["len"])
    np.testing.assert_allclose(np.asarray(chunk_logits),
                               np.asarray(seq_logits), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(chunk_cache["len"]),
                                  np.asarray(seq_cache["len"]))
    for k in ("k", "k2", "v"):
        np.testing.assert_allclose(np.asarray(chunk_cache[k]),
                                   np.asarray(seq_cache[k]),
                                   rtol=1e-5, atol=1e-6)


def _run_both(target, tparams, draft, dparams, jobs, gamma, max_batch=3):
    plain = DecodeEngine(target, tparams, max_batch=max_batch)
    spec = SpecDecodeEngine(target, tparams, draft, dparams,
                            max_batch=max_batch, gamma=gamma)
    rids_p = [plain.submit(p, n) for p, n in jobs]
    rids_s = [spec.submit(p, n) for p, n in jobs]
    res_p, res_s = plain.run(), spec.run()
    return [res_p[r] for r in rids_p], [res_s[r] for r in rids_s]


def test_spec_engine_matches_plain_engine_mixed_batch():
    """Mixed prompt lengths/budgets, more requests than slots, random
    draft: every stream must be identical to the plain engine's."""
    target, tparams = _model(n_layer=3, n_embd=32, seed=1)
    draft, dparams = _model(n_layer=1, n_embd=16, seed=7)
    jobs = [([5, 17, 3, 41], 12), ([1, 2], 9), ([30, 31, 32, 33, 34, 35], 7),
            ([9], 11), ([25, 24, 23], 5)]
    for gamma in (1, 3):
        out_p, out_s = _run_both(target, tparams, draft, dparams, jobs, gamma)
        assert out_s == out_p


def test_spec_engine_perfect_draft_fewer_steps():
    """draft == target: everything accepted, so the engine finishes a
    single request in ~max_new/(gamma+1) steps instead of max_new."""
    target, tparams = _model(n_layer=2, seed=3)
    gamma, max_new = 3, 16
    spec = SpecDecodeEngine(target, tparams, target, tparams,
                            max_batch=2, gamma=gamma)
    plain = DecodeEngine(target, tparams, max_batch=2)
    prompt = [4, 8, 15, 16]
    rid_s = spec.submit(prompt, max_new)
    rid_p = plain.submit(prompt, max_new)
    steps = 0
    while not spec.is_done(rid_s):
        spec.step()
        steps += 1
    plain.run()
    assert spec.results[rid_s] == plain.results[rid_p]
    # 1 admission token + ceil((max_new-1)/(gamma+1)) verify rounds
    assert steps <= 1 + -(-(max_new - 1) // (gamma + 1))


def test_spec_engine_eos_mid_chunk():
    """An EOS accepted mid-chunk must terminate the stream exactly where
    the plain engine (with the same eos) stops."""
    target, tparams = _model(n_layer=2, seed=5)
    draft, dparams = _model(n_layer=1, n_embd=16, seed=11)
    prompt = [3, 1, 4, 1, 5]
    plain = DecodeEngine(target, tparams, max_batch=2, eos_id=None)
    rid = plain.submit(prompt, 20)
    toks = plain.run()[rid]
    eos = toks[len(toks) // 2]  # force an EOS to land mid-stream
    plain2 = DecodeEngine(target, tparams, max_batch=2, eos_id=eos)
    spec = SpecDecodeEngine(target, tparams, draft, dparams, max_batch=2,
                            gamma=4, eos_id=eos)
    r_p = plain2.submit(prompt, 20)
    r_s = spec.submit(prompt, 20)
    assert spec.run()[r_s] == plain2.run()[r_p]


def test_spec_engine_validates_inputs():
    target, tparams = _model()
    draft, dparams = _model(n_layer=1, seed=2)
    with pytest.raises(ValueError, match="gamma"):
        SpecDecodeEngine(target, tparams, draft, dparams, gamma=0)
    small_draft, sd_params = _model(n_layer=1, block=32, seed=2)
    with pytest.raises(ValueError, match="block_size"):
        SpecDecodeEngine(target, tparams, small_draft, sd_params)


def test_spec_engine_rejects_sampling_overrides():
    target, tparams = _model()
    draft, dparams = _model(seed=2)
    spec = SpecDecodeEngine(target, tparams, draft, dparams, max_batch=1)
    with pytest.raises(ValueError, match="greedy-only"):
        spec.submit([1, 2, 3], 4, temperature=1.0)
    with pytest.raises(ValueError, match="greedy-only"):
        spec.submit([1, 2, 3], 4, top_k=5)
