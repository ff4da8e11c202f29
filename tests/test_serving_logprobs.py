"""Per-token logprob tracking in the serving engines.

Contract: with ``logprobs_topk > 0`` every emitted token gets the fp32
log-softmax of the RAW model logits (pre-temperature/penalties/bias)
plus the top-k alternatives, 1:1 with ``results``; emitted tokens are
unchanged; dense, paged (incl. preemption), chunked-prefill, and
speculative engines all record identical values for identical prefixes.

Beyond-reference capability (the reference has no serving stack,
SURVEY §0); the OpenAI-side mapping is tested in
tests/test_serving_openai.py.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_baseline
from mop_tpu.models.generate import prefill
from mop_tpu.serving import DecodeEngine, PagedDecodeEngine, SpecDecodeEngine

VOCAB = 50


def _setup(block=64, layers=2):
    cfg = TransformerConfig(n_layer=layers, n_head=2, n_embd=32,
                            dropout=0.0, block_size=block)
    model = create_gpt_baseline(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


def _oracle_lp(model, params, prefix, tok):
    """log P(tok | prefix) from a fresh full prefill — the ground truth
    the engines must reproduce."""
    logits, _ = prefill(model, params,
                        jnp.asarray([prefix], jnp.int32))
    lsm = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    return float(lsm[0, tok])


def test_dense_logprobs_match_oracle():
    model, params = _setup()
    prompt, n = [3, 1, 4], 6
    plain = DecodeEngine(model, params, max_batch=2)
    rp = plain.submit(prompt, n)
    want = plain.run()[rp]

    eng = DecodeEngine(model, params, max_batch=2, logprobs_topk=3)
    rid = eng.submit(prompt, n)
    toks = eng.run()[rid]
    assert toks == want  # tracking changes nothing about decoding
    lps, tops = eng.logprobs[rid], eng.top_logprobs[rid]
    assert len(lps) == len(tops) == len(toks)
    for i, (t, lp, alts) in enumerate(zip(toks, lps, tops)):
        # greedy: the chosen token IS the top-1 alternative
        assert alts[0][0] == t and abs(alts[0][1] - lp) < 1e-6
        assert alts[0][1] >= alts[1][1] >= alts[2][1]
        # every entry equals a fresh full-forward log-softmax (the
        # admission entry exactly; decode entries within the cached-vs-
        # fresh reduction-order tolerance of the KV path)
        tol = 1e-5 if i == 0 else 2e-3
        assert abs(lp - _oracle_lp(model, params,
                                   prompt + toks[:i], t)) < tol


def test_sampled_logprobs_are_model_distribution():
    """With temperature on, the recorded logprob is still the RAW model
    distribution at the chosen token (not the tempered sampler's)."""
    model, params = _setup()
    prompt = [7, 8, 9]
    eng = DecodeEngine(model, params, max_batch=1, logprobs_topk=2,
                       rng=jax.random.PRNGKey(7))
    rid = eng.submit(prompt, 5, temperature=1.5, top_k=10)
    toks = eng.run()[rid]
    lps = eng.logprobs[rid]
    for i, (t, lp) in enumerate(zip(toks, lps)):
        # sampled tail tokens sit where the cached-vs-fresh softmax
        # reduction drift is largest; still well under 1% of a nat
        assert abs(lp - _oracle_lp(model, params,
                                   prompt + toks[:i], t)) < 1e-2


def test_logprobs_validation_and_off_by_default():
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=1)
    rid = eng.submit([1, 2], 3)
    eng.run()
    assert eng.logprobs == {} and eng.top_logprobs == {}
    with pytest.raises(ValueError, match="logprobs_topk"):
        DecodeEngine(model, params, logprobs_topk=-1)
    with pytest.raises(ValueError, match="logprobs_topk"):
        DecodeEngine(model, params, logprobs_topk=64)


def test_paged_logprobs_match_dense_through_preemption():
    """The paged engine under page pressure (preempt + exact re-prefill)
    records the same logprobs as the dense engine."""
    model, params = _setup(block=32)
    jobs = [([3, 1, 4], 10), ([2, 7], 10), ([11, 9, 8], 10)]
    dense = DecodeEngine(model, params, max_batch=3, logprobs_topk=2)
    drids = [dense.submit(*j) for j in jobs]
    dres = dense.run()

    paged = PagedDecodeEngine(model, params, max_batch=3, n_pages=5,
                              page_size=8, logprobs_topk=2)
    prids = [paged.submit(*j) for j in jobs]
    pres = paged.run()
    assert paged.preemptions > 0  # the scenario actually preempted
    for dr, pr in zip(drids, prids):
        assert pres[pr] == dres[dr]
        # paged attention (page gathers) and post-preemption re-prefill
        # reduce in a different order than dense decode: same values to
        # ~1e-3, exact only where no preemption intervened
        assert np.allclose(paged.logprobs[pr], dense.logprobs[dr],
                           atol=2e-3)
        for pa, da in zip(paged.top_logprobs[pr], dense.top_logprobs[dr]):
            assert [t for t, _ in pa] == [t for t, _ in da]
            assert np.allclose([v for _, v in pa], [v for _, v in da],
                               atol=2e-3)


def test_chunked_prefill_logprobs_match_monolithic():
    model, params = _setup()
    prompt = list(np.random.RandomState(3).randint(0, VOCAB, size=21))
    mono = DecodeEngine(model, params, max_batch=1, logprobs_topk=2)
    rm = mono.submit(prompt, 6)
    mres = mono.run()[rm]

    chunked = DecodeEngine(model, params, max_batch=1, logprobs_topk=2,
                           chunk_prefill=8)
    rc = chunked.submit(prompt, 6)
    cres = chunked.run()[rc]
    assert cres == mres
    # chunked feeding reduces the prefill in a different order
    assert np.allclose(chunked.logprobs[rc], mono.logprobs[rm], atol=2e-3)


def test_speculative_logprobs_match_plain():
    """Speculative decoding emits the target's own tokens; the recorded
    logprobs must equal the plain engine's for the same stream."""
    model, params = _setup(layers=2)
    dmodel, dparams = _setup(layers=1)
    plain = DecodeEngine(model, params, max_batch=2, logprobs_topk=2)
    r0 = plain.submit([3, 1, 4], 10)
    plain.run()

    spec = SpecDecodeEngine(model, params, dmodel, dparams, max_batch=2,
                            gamma=3, logprobs_topk=2)
    r1 = spec.submit([3, 1, 4], 10)
    spec.run()
    assert spec.results[r1] == plain.results[r0]
    # the verify pass computes logits in (gamma+1)-token chunks
    assert np.allclose(spec.logprobs[r1], plain.logprobs[r0], atol=2e-3)
    for sa, pa in zip(spec.top_logprobs[r1], plain.top_logprobs[r0]):
        assert [t for t, _ in sa] == [t for t, _ in pa]


def test_eos_token_logprob_recorded():
    """A stream retired by EOS keeps 1:1 alignment (the EOS emission has
    a logprob entry too)."""
    model, params = _setup()
    probe = DecodeEngine(model, params, max_batch=1)
    rp = probe.submit([1, 2, 3], 10)
    ref = probe.run()[rp]
    eos = ref[2]
    eng = DecodeEngine(model, params, max_batch=1, logprobs_topk=1)
    rid = eng.submit([1, 2, 3], 10, eos_id=eos)
    toks = eng.run()[rid]
    assert toks[-1] == eos
    assert len(eng.logprobs[rid]) == len(toks)
