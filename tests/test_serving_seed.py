"""Per-request seeded sampling (OpenAI `seed`, made exact).

The pinned property: a request submitted with ``seed=s`` draws its n-th
output token from ``fold_in(PRNGKey(s), n)`` — a stream owned entirely by
the request — so its tokens depend only on (prompt, sampling params, seed)
and are bit-identical regardless of co-batched traffic, admission order,
the engine's own rng, or paged preemption. The reference has no serving
or sampling stack at all (SURVEY §0); OpenAI documents `seed` as
best-effort — the slot-pool engine can make it exact because every row's
key is derived per row (inline in engine.py DecodeEngine._pick_rows).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_quartet
from mop_tpu.serving import DecodeEngine, PagedDecodeEngine
from mop_tpu.serving import openai_api as oai


def _setup(block=32, vocab=50):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=block)
    model = create_gpt_quartet(vocab, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


SAMP = dict(temperature=1.7, top_k=20)
PROMPT = [5, 17, 3, 41]


def test_seeded_request_independent_of_cobatching():
    """Same seeded request: solo on one engine vs co-batched with noisy
    unseeded traffic on an engine with a DIFFERENT rng — identical."""
    model, params = _setup()
    eng_a = DecodeEngine(model, params, max_batch=4,
                         rng=jax.random.PRNGKey(7))
    ra = eng_a.submit(PROMPT, 12, seed=123, **SAMP)
    toks_a = eng_a.run()[ra]

    eng_b = DecodeEngine(model, params, max_batch=4,
                         rng=jax.random.PRNGKey(999))
    eng_b.submit([1, 2, 3], 12, temperature=2.5)      # unseeded noise
    eng_b.submit([9, 8, 7, 6, 5], 8, temperature=2.0)
    eng_b.step()                                       # stagger admission
    rb = eng_b.submit(PROMPT, 12, seed=123, **SAMP)
    toks_b = eng_b.run()[rb]
    assert toks_a == toks_b
    assert len(toks_a) == 12


def test_same_seed_same_tokens_different_seed_differs():
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=4)
    r1 = eng.submit(PROMPT, 16, seed=5, **SAMP)
    r2 = eng.submit(PROMPT, 16, seed=5, **SAMP)
    r3 = eng.submit(PROMPT, 16, seed=6, **SAMP)
    res = eng.run()
    assert res[r1] == res[r2]
    # 16 high-temperature draws over a 20-token nucleus: a collision of
    # the full streams is astronomically unlikely
    assert res[r1] != res[r3]


def test_seed_ignored_when_greedy():
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=2)
    r1 = eng.submit(PROMPT, 10, seed=77)           # temperature 0 default
    r2 = eng.submit(PROMPT, 10)
    res = eng.run()
    assert res[r1] == res[r2]


def test_seeded_replay_across_paged_preemption():
    """A seeded sampled request preempted mid-decode (pool exhaustion)
    re-admits and CONTINUES its stream at the right position: tokens
    equal the un-preempted run bit-exactly. Greedy replay was already
    exact (position state depends only on the prefix); seeded sampling
    adds the rng stream, which _slot_ntok re-anchors at re-admission."""
    model, params = _setup(block=32)
    jobs = [([5, 17, 3, 41, 2, 9, 11, 4], 16), ([1, 2, 3, 4, 5, 6, 7, 8], 16)]
    # ample pool: no preemption
    big = PagedDecodeEngine(model, params, max_batch=2, n_pages=24,
                            page_size=4)
    rids = [big.submit(p, n, seed=50 + i, **SAMP)
            for i, (p, n) in enumerate(jobs)]
    res_big = big.run()
    want = [res_big[r] for r in rids]
    assert big.preemptions == 0
    # starved pool: both requests eventually need 6 pages each (24
    # positions) but only 9 usable pages exist -> forced preemption
    # mid-decode (same geometry as test_preemption_exact_greedy)
    small = PagedDecodeEngine(model, params, max_batch=2, n_pages=9,
                              page_size=4, rng=jax.random.PRNGKey(42))
    rids = [small.submit(p, n, seed=50 + i, **SAMP)
            for i, (p, n) in enumerate(jobs)]
    res = small.run()
    assert small.preemptions > 0
    assert [res[r] for r in rids] == want


def test_seed_validation():
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=1)
    for bad in (-1, 2 ** 31, 10 ** 12):
        with pytest.raises(ValueError):
            eng.submit([1, 2], 4, seed=bad)


def test_unseeded_sampling_still_varies_with_engine_rng():
    model, params = _setup()
    outs = []
    for key in (0, 1):
        eng = DecodeEngine(model, params, max_batch=1,
                           rng=jax.random.PRNGKey(key))
        r = eng.submit(PROMPT, 16, **SAMP)
        outs.append(eng.run()[r])
    assert outs[0] != outs[1]


# ---------------- OpenAI surface ----------------


class _Tok:
    def encode(self, s):
        return [ord(c) % 50 for c in s]

    def decode(self, toks):
        return "".join(chr(97 + (t % 26)) for t in toks)


def test_openai_parses_seed():
    req = {"model": "m", "prompt": "ab", "seed": 42, "temperature": 1.0}
    p = oai.parse_completion(req, _Tok())
    assert p["kw"]["seed"] == 42


def test_chat_body_has_system_fingerprint():
    body = oai.chat_body(1, "m", 0, [], 3, 4)
    assert body["system_fingerprint"] == oai.SYSTEM_FINGERPRINT
    chunk = oai.chat_chunk(1, "m", 0, {"content": "x"})
    assert chunk["system_fingerprint"] == oai.SYSTEM_FINGERPRINT
