"""GPT_MoP in the decode/serving stack — the namesake model, servable.

The reference's GPT_MoP computes teacher-forced logits only
(``/root/reference/mop/models/gpt_mop.py:181-207``) and its gate convs are
non-causal (centered same-padding, ``gpt_mop.py:35-47``), which makes exact
KV caching impossible for it. This suite pins the two serving stories:

1. ``create_gpt_mop_causal`` (left-padded gate convs + causal-prefix score
   standardization): position t depends only on tokens <= t, so the
   KV-cached decode, the continuous-batching engine, the paged engine, and
   chunked/speculative verification are all EXACT — token-for-token equal
   to the full-window sampler.
2. ``create_gpt_mop`` (reference-exact non-causal convs): serves under the
   documented frontier approximation (``models.generate._mop_taps``) —
   internally consistent (engine == generate_cached) with measured
   divergence vs the full-window sampler in benchmarks/decode.md.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import (TransformerConfig, create_gpt_mop,
                            create_gpt_mop_causal)
from mop_tpu.models.generate import (decode_chunk, decode_step, generate,
                                     generate_cached, prefill,
                                     prefill_padded)
from mop_tpu.serving import DecodeEngine, PagedDecodeEngine

VOCAB = 61


def _mk(causal=True, use_quartet=True, block=48):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=block, use_quartet=use_quartet)
    maker = create_gpt_mop_causal if causal else create_gpt_mop
    model = maker(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return model, params


@pytest.fixture(scope="module")
def causal_setup():
    return _mk(causal=True)


@pytest.fixture(scope="module")
def ref_setup():
    return _mk(causal=False)


def test_causal_variant_is_causal(causal_setup):
    """Perturbing a future token must not change past logits — the
    property that makes cached decode exact."""
    model, params = causal_setup
    idx = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    a, _ = model.apply(params, idx)
    b, _ = model.apply(params, idx.at[0, 6].set(9))
    np.testing.assert_allclose(np.asarray(a[0, :6]), np.asarray(b[0, :6]),
                               atol=1e-6)


def test_ref_variant_is_not_causal(ref_setup):
    """The reference-exact variant leaks future tokens into past positions
    (both the centered conv and the all-columns standardization) — the
    documented reason its cached decode is approximate."""
    model, params = ref_setup
    idx = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    a, _ = model.apply(params, idx)
    b, _ = model.apply(params, idx.at[0, 6].set(9))
    assert not np.allclose(np.asarray(a[0, :6]), np.asarray(b[0, :6]))


@pytest.mark.parametrize("use_quartet", [True, False])
def test_causal_cached_equals_full_window(use_quartet):
    """The headline exactness contract: generate_cached == generate,
    token for token, greedy and sampled."""
    model, params = _mk(causal=True, use_quartet=use_quartet)
    prompt = jnp.array([[5, 17, 3, 9, 22, 41, 7]], jnp.int32)
    exact = generate(model, params, prompt, 20)
    cached = generate_cached(model, params, prompt, 20)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(cached))
    rng = jax.random.PRNGKey(7)
    s1 = generate(model, params, prompt, 15, rng=rng, temperature=0.8,
                  top_k=12)
    s2 = generate_cached(model, params, prompt, 15, rng=rng,
                         temperature=0.8, top_k=12)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_prefill_padded_matches_prefill(causal_setup):
    model, params = causal_setup
    prompt = jnp.array([[5, 17, 3, 9, 22]], jnp.int32)
    lg1, c1 = prefill(model, params, prompt)
    padded = jnp.zeros((1, 16), jnp.int32).at[:, :5].set(prompt)
    lg2, c2 = prefill_padded(model, params, padded, 5)
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1["mv"][:, :, :5]),
                               np.asarray(c2["mv"][:, :, :5]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1["k"][:, :, :, :5]),
                               np.asarray(c2["k"][:, :, :, :5]), atol=1e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_decode_chunk_equals_step_composition(causal):
    """decode_chunk must equal G sequential decode_step calls — the
    speculative-verify contract — for BOTH gate orientations (the chunk
    zeroes intra-chunk future taps to match the step composition)."""
    model, params = _mk(causal=causal)
    prompt = jnp.array([[5, 17, 3, 9]], jnp.int32)
    _, cache = prefill(model, params, prompt)
    toks = jnp.array([[2, 8, 1, 4]], jnp.int32)
    lg_chunk, c_chunk = decode_chunk(model, params, cache, toks)
    c_step = cache
    step_logits = []
    for j in range(4):
        lg, c_step = decode_step(model, params, c_step, toks[:, j])
        step_logits.append(lg)
    np.testing.assert_allclose(np.asarray(lg_chunk[0]),
                               np.asarray(jnp.stack(step_logits)[:, 0]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(c_chunk["mv"]),
                               np.asarray(c_step["mv"]), atol=1e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_engine_matches_generate_cached(causal):
    """Continuous-batching engine == single-stream generate_cached for
    co-batched unrelated requests (both orientations: the engine and
    generate_cached share the same decode math)."""
    model, params = _mk(causal=causal)
    prompts = [[5, 17, 3], [9, 8, 7, 6, 2], [1, 4]]
    eng = DecodeEngine(model, params, max_batch=4)
    rids = [eng.submit(p, max_new_tokens=12) for p in prompts]
    out = eng.run()
    for p, rid in zip(prompts, rids):
        solo = generate_cached(model, params,
                               jnp.asarray([p], jnp.int32), 12)
        np.testing.assert_array_equal(
            np.asarray(out[rid]), np.asarray(solo[0, len(p):]))


def test_engine_causal_matches_full_window_sampler(causal_setup):
    """The VERDICT contract: the ENGINE serving the causal variant equals
    the exact full-window sampler token-for-token."""
    model, params = causal_setup
    prompts = [[5, 17, 3, 9], [2, 4]]
    eng = DecodeEngine(model, params, max_batch=2)
    rids = [eng.submit(p, max_new_tokens=16) for p in prompts]
    out = eng.run()
    for p, rid in zip(prompts, rids):
        full = generate(model, params, jnp.asarray([p], jnp.int32), 16)
        np.testing.assert_array_equal(
            np.asarray(out[rid]), np.asarray(full[0, len(p):]))


def test_engine_prefill_buckets_and_chunked(causal_setup):
    """Bucketed admission and chunked prefill preserve exactness for the
    causal MoP variant (pad columns stay out of gate taps and row stats)."""
    model, params = causal_setup
    prompt = list(np.arange(1, 19) % VOCAB)
    base = DecodeEngine(model, params, max_batch=2)
    r0 = base.submit(prompt, max_new_tokens=10)
    want = base.run()[r0]
    for kw in ({"prefill_buckets": [8, 32]}, {"chunk_prefill": 8}):
        eng = DecodeEngine(model, params, max_batch=2, **kw)
        rid = eng.submit(prompt, max_new_tokens=10)
        got = eng.run()[rid]
        assert got == want, kw


def test_paged_engine_matches_dense(causal_setup):
    """Paged GPT_MoP serving (mv pages ride the same tables) == dense
    engine, including under forced preemption pressure."""
    model, params = causal_setup
    prompts = [[5, 17, 3], [9, 8, 7, 6], [1, 4, 2, 11, 30]]
    dense = DecodeEngine(model, params, max_batch=4)
    rd = [dense.submit(p, max_new_tokens=10) for p in prompts]
    want = dense.run()
    paged = PagedDecodeEngine(model, params, max_batch=4, n_pages=14,
                              page_size=8)
    rp = [paged.submit(p, max_new_tokens=10) for p in prompts]
    got = paged.run()
    for a, b in zip(rd, rp):
        assert want[a] == got[b]


def test_prefix_cache_reuses_mop_state(causal_setup):
    """Prefix-cache hits must restore the view history too — a second
    request sharing a long prefix gets identical tokens."""
    model, params = causal_setup
    sys_prompt = [7, 7, 3, 9, 22, 41, 5, 17, 2, 8]
    p1 = sys_prompt + [1, 2]
    p2 = sys_prompt + [4, 6]
    base = DecodeEngine(model, params, max_batch=2)
    r_base = base.submit(p2, max_new_tokens=10)
    want = base.run()[r_base]
    eng = DecodeEngine(model, params, max_batch=2, prefix_cache_entries=4)
    eng.submit(p1, max_new_tokens=4)
    eng.run()
    rid = eng.submit(p2, max_new_tokens=10)
    got = eng.run()[rid]
    assert eng.prefix_cache_hits >= 1
    assert got == want


def test_echo_scoring_gpt_mop(causal_setup):
    """prompt_logprobs (OpenAI echo) works for GPT_MoP and is finite."""
    from mop_tpu.serving.scoring import prompt_logprobs

    model, params = causal_setup
    lps, tops = prompt_logprobs(model, params, [5, 17, 3, 9, 22], n_top=2)
    assert lps[0] is None and len(lps) == 5
    assert all(np.isfinite(v) for v in lps[1:])
    assert all(len(t) == 2 for t in tops[1:])
