"""Chunked prefill in the continuous-batching engine (engine.py
``chunk_prefill=``).

A prompt longer than the chunk size C is fed one C-token chunk per
engine step instead of one monolithic prefill dispatch, so per-step
device work is bounded by C whatever the prompt length and co-batched
decode streams keep emitting a token EVERY step while a long prompt
ramps in (the Sarathi/vLLM chunked-prefill property). Pinned here:
token equality vs the monolithic engine (greedy/sampled/penalized/
constrained), the every-step-progress latency property, prefix-cache
composition (only the uncached tail is chunked), cancellation
mid-prefill, and chunk-dispatch accounting.

Beyond-reference capability (the reference has no generation at all,
SURVEY §0; its GPT stops at teacher-forced logits,
``mop/models/gpt_mop.py:181-207``).
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_baseline, \
    create_gpt_quartet
from mop_tpu.serving import DecodeEngine, choices

EOS = 0


def _setup(use_quartet=True, block=96, vocab=50):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=block)
    mk = create_gpt_quartet if use_quartet else create_gpt_baseline
    model = mk(vocab, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


def _prompt(n, seed=0):
    return np.random.RandomState(seed).randint(1, 49, size=n).tolist()


@pytest.mark.parametrize("use_quartet", [True, False])
def test_chunked_equals_monolithic(use_quartet):
    """Same submissions, chunked vs monolithic admission: identical
    tokens for long (chunked), short (un-chunked), and penalized rows.
    (Greedy/penalized decoding is rng-independent, so the two engines'
    different PRNG consumption patterns cannot mask a math difference.)"""
    model, params = _setup(use_quartet)
    jobs = [(_prompt(37, 1), 10, {}),               # 37 = 4*8+5 chunks
            (_prompt(5, 2), 8, {}),                 # below C: monolithic
            (_prompt(24, 3), 10, {"frequency_penalty": 0.7}),
            (_prompt(16, 4), 8, {"repetition_penalty": 1.3})]
    want, got = {}, {}
    for chunk, out in ((None, want), (8, got)):
        eng = DecodeEngine(model, params, max_batch=4, eos_id=EOS,
                           rng=jax.random.PRNGKey(7), chunk_prefill=chunk)
        rids = [eng.submit(p, n, **kw) for p, n, kw in jobs]
        res = eng.run()
        for i, rid in enumerate(rids):
            out[i] = res[rid]
    assert got == want


def test_chunked_sampling_deterministic_and_in_support():
    """Sampled rows under chunked prefill: same seed -> same stream, and
    every token is in the top-k support (the chunked tok0 goes through
    the same picker as the monolithic path)."""
    model, params = _setup()
    outs = []
    for _ in range(2):
        eng = DecodeEngine(model, params, max_batch=2, eos_id=-2,
                           rng=jax.random.PRNGKey(11), chunk_prefill=8)
        rid = eng.submit(_prompt(30, 13), 12, eos_id=-1, temperature=1.4,
                         top_k=9)
        outs.append(eng.run()[rid])
    assert outs[0] == outs[1] and len(outs[0]) == 12


def test_cobatched_stream_progresses_every_step():
    """THE chunked-prefill property: while a long prompt feeds in, an
    already-active stream emits one token on every engine step (the
    monolithic engine would stall it for the whole prefill); the ramping
    request's stream is unchanged vs its solo run."""
    model, params = _setup()
    long_prompt, short_prompt = _prompt(49, 5), _prompt(4, 6)
    solo = DecodeEngine(model, params, max_batch=2, eos_id=-2,
                        chunk_prefill=8)
    r = solo.submit(long_prompt, 6, eos_id=-1)
    long_want = solo.run()[r]

    eng = DecodeEngine(model, params, max_batch=2, eos_id=-2,
                       chunk_prefill=8)
    r_short = eng.submit(short_prompt, 40, eos_id=-1)
    eng.step()  # short admitted + first decode
    r_long = eng.submit(long_prompt, 6, eos_id=-1)
    while not eng.is_done(r_long):
        before = len(eng.results[r_short])
        eng.step()
        if not eng.is_done(r_short):
            assert len(eng.results[r_short]) == before + 1, \
                "co-batched stream stalled during chunked prefill"
    eng.run()
    assert eng.results[r_long] == long_want
    assert len(eng.results[r_short]) == 40


def test_chunk_dispatch_accounting():
    """A t0-token prompt takes ceil((t0-lcp)/C) chunk feeds; the engine
    needs exactly that many steps (+1 admission) before tok0 lands."""
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=2, eos_id=-2,
                       chunk_prefill=8)
    rid = eng.submit(_prompt(21, 7), 3, eos_id=-1)  # ceil(21/8) = 3 chunks
    eng.step()  # admit + chunk 1
    assert eng.results[rid] == [] and not eng.is_done(rid)
    eng.step()  # chunk 2
    assert eng.results[rid] == []
    eng.step()  # chunk 3 (final) -> tok0 + first decode token
    assert len(eng.results[rid]) == 2
    eng.run()
    assert len(eng.results[rid]) == 3


def test_chunked_with_prefix_cache():
    """Prefix hit + chunking: only the uncached tail is chunked and the
    tokens still equal the monolithic engine's."""
    model, params = _setup()
    sys_prompt = _prompt(30, 8)
    jobs = [(sys_prompt + _prompt(19, 9), 8),
            (sys_prompt + _prompt(11, 10), 8)]
    want = {}
    mono = DecodeEngine(model, params, max_batch=2, eos_id=EOS)
    for i, (p, n) in enumerate(jobs):
        rid = mono.submit(p, n)  # sequential: no cross-slot rng coupling
        want[i] = mono.run()[rid]
    eng = DecodeEngine(model, params, max_batch=2, eos_id=EOS,
                       chunk_prefill=8, prefix_cache_entries=4)
    r0 = eng.submit(*jobs[0])
    assert eng.run()[r0] == want[0]
    r1 = eng.submit(*jobs[1])
    assert eng.run()[r1] == want[1]
    assert eng.prefix_cache_hits == 1
    assert eng.prefix_tokens_reused == 30


def test_chunked_constrained_and_cancel():
    """A guided request chunks its prompt then decodes under its DFA;
    cancelling mid-prefill frees the slot for the next request."""
    model, params = _setup()
    opts = [[9, 31, 7], [9, 14]]
    eng = DecodeEngine(model, params, max_batch=1, eos_id=EOS,
                       chunk_prefill=8)
    r_cancel = eng.submit(_prompt(40, 11), 8, eos_id=-1)
    eng.step()  # admit + chunk 1 of 5
    assert eng.cancel(r_cancel)
    r_con = eng.submit(_prompt(20, 12), 12, constraint=choices(opts))
    res = eng.run()
    assert res[r_con][-1] == EOS and res[r_con][:-1] in opts
    assert res[r_cancel] == []


def test_bad_chunk_size_rejected():
    model, params = _setup(block=32)
    for bad in (0, -4, 33):
        with pytest.raises(ValueError, match="chunk_prefill"):
            DecodeEngine(model, params, max_batch=2, chunk_prefill=bad)
