"""Per-request min-p and repetition/presence/frequency penalties in the
serving engines.

Load-bearing property: a penalized request in the batched engine emits
EXACTLY what the single-stream ``generate_cached`` sampler emits with the
same penalties — including the prefill's first token and across paged
preemption (penalty counts survive re-admission because they are rebuilt
from the request's emitted-token history).
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import (TransformerConfig, create_gpt_baseline,
                            create_gpt_quartet, generate_cached)
from mop_tpu.serving import DecodeEngine, PagedDecodeEngine


def _setup(use_quartet=True, block=32, vocab=50):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=block)
    mk = create_gpt_quartet if use_quartet else create_gpt_baseline
    model = mk(vocab, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


def _reference(model, params, prompt, max_new, **kw):
    out = generate_cached(model, params,
                          jnp.asarray(prompt, jnp.int32)[None],
                          max_new_tokens=max_new, **kw)
    return np.asarray(out)[0, len(prompt):].tolist()


PEN = dict(repetition_penalty=1.4, presence_penalty=0.6,
           frequency_penalty=0.3)


@pytest.mark.parametrize("use_quartet", [True, False])
def test_penalized_greedy_matches_generate_cached(use_quartet):
    model, params = _setup(use_quartet)
    prompt = [5, 17, 3, 41, 2, 9]
    eng = DecodeEngine(model, params, max_batch=4)
    rid = eng.submit(prompt, max_new_tokens=12, **PEN)
    results = eng.run()
    assert results[rid] == _reference(model, params, prompt, 12, **PEN)


def test_mixed_penalized_and_plain_rows_are_independent():
    """One penalized and one plain greedy request in the same batch: each
    must equal its solo decode — the count buffers are strictly per-row."""
    model, params = _setup()
    p0, p1 = [1, 2, 3], [7, 8, 9, 10, 11]
    eng = DecodeEngine(model, params, max_batch=4)
    r0 = eng.submit(p0, 10, **PEN)
    r1 = eng.submit(p1, 10)
    results = eng.run()
    assert results[r0] == _reference(model, params, p0, 10, **PEN)
    assert results[r1] == _reference(model, params, p1, 10)


def test_huge_presence_penalty_emits_distinct_tokens():
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=2)
    rid = eng.submit([4, 4, 4], max_new_tokens=12, presence_penalty=1e4)
    toks = eng.run()[rid]
    assert len(set(toks)) == len(toks)


def test_min_p_one_collapses_sampling_to_greedy():
    model, params = _setup()
    prompt = [3, 14, 15]
    greedy = _reference(model, params, prompt, 8)
    eng = DecodeEngine(model, params, max_batch=2,
                       rng=jax.random.PRNGKey(9))
    rid = eng.submit(prompt, 8, temperature=2.5, min_p=1.0)
    assert eng.run()[rid] == greedy


def test_paged_penalized_greedy_matches_dense_under_preemption():
    """Force preemption on the paged engine (pool too small for both
    requests) with penalties active: re-admission rebuilds the penalty
    counts from emitted history, so every stream still equals its solo
    penalized decode."""
    model, params = _setup(block=32)
    p0, p1 = [1, 2, 3, 4, 5, 6, 7, 8], [40, 41, 42, 43, 44, 45, 46, 47]
    want0 = _reference(model, params, p0, 16, **PEN)
    want1 = _reference(model, params, p1, 16, **PEN)
    eng = PagedDecodeEngine(model, params, max_batch=2, n_pages=3,
                            page_size=16)  # 48 rows: 2 full seqs don't fit
    r0 = eng.submit(p0, 16, **PEN)
    r1 = eng.submit(p1, 16, **PEN)
    results = eng.run()
    assert eng.preemptions > 0, "pool sized to force preemption"
    assert results[r0] == want0
    assert results[r1] == want1


def test_submit_validates_penalty_args():
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=2)
    with pytest.raises(ValueError, match="min_p"):
        eng.submit([1, 2], 4, min_p=1.5)
    with pytest.raises(ValueError, match="repetition_penalty"):
        eng.submit([1, 2], 4, repetition_penalty=0.0)


def test_spec_engine_rejects_penalties():
    from mop_tpu.serving import SpecDecodeEngine
    model, params = _setup()
    dmodel, dparams = _setup(use_quartet=False)
    eng = SpecDecodeEngine(model, params, dmodel, dparams, max_batch=2,
                           gamma=2)
    with pytest.raises(ValueError, match="greedy-only"):
        eng.submit([1, 2], 4, presence_penalty=0.5)


# ------------------------- logit bias & stop sequences -------------------------

def test_logit_bias_bans_and_forces_tokens():
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=2)
    # ban the unbiased greedy stream's tokens -> none may appear
    base = _reference(model, params, [5, 17, 3], 8)
    ban = {t: -1e9 for t in set(base)}
    r0 = eng.submit([5, 17, 3], 8, logit_bias=ban)
    toks = eng.run()[r0]
    assert not set(toks) & set(ban)
    # +large bias forces a token every step (greedy)
    eng2 = DecodeEngine(model, params, max_batch=2)
    r1 = eng2.submit([5, 17, 3], 6, logit_bias={42: 1e9})
    assert eng2.run()[r1] == [42] * 6


def test_logit_bias_rows_are_isolated():
    """A biased and an unbiased request in one batch: the unbiased stream
    must equal its solo decode."""
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=4)
    r0 = eng.submit([5, 17, 3], 8, logit_bias={0: 50.0})
    r1 = eng.submit([7, 8, 9], 8)
    res = eng.run()
    assert res[r1] == _reference(model, params, [7, 8, 9], 8)


def test_logit_bias_validates_token_range():
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=2)
    with pytest.raises(ValueError, match="outside vocab"):
        eng.submit([1, 2], 4, logit_bias={50: 1.0})


def _expected_stop(base, stops):
    """First prefix of ``base`` whose suffix matches a stop spec."""
    for i in range(1, len(base) + 1):
        pre = base[:i]
        if any(len(pre) >= len(sq) and pre[-len(sq):] == sq
               for sq in stops):
            return pre
    return base


def test_stop_sequence_retires_request():
    model, params = _setup()
    base = _reference(model, params, [5, 17, 3], 12)
    stop_seq = base[3:5]  # the 4th-5th greedy tokens
    want = _expected_stop(base, [stop_seq])
    assert len(want) < len(base)  # the stop actually triggers mid-stream
    eng = DecodeEngine(model, params, max_batch=2)
    rid = eng.submit([5, 17, 3], 12, stop=[stop_seq])
    toks = eng.run()[rid]
    assert toks == want  # stops right after the match, incl. the match
    assert eng.is_done(rid)


def test_int_stop_entries_act_as_extra_eos():
    model, params = _setup()
    base = _reference(model, params, [5, 17, 3], 12)
    eng = DecodeEngine(model, params, max_batch=2)
    rid = eng.submit([5, 17, 3], 12, stop=[base[2]])
    assert eng.run()[rid] == _expected_stop(base, [[base[2]]])


def test_paged_engine_supports_bias_and_stop():
    model, params = _setup()
    base = _reference(model, params, [5, 17, 3], 10)
    eng = PagedDecodeEngine(model, params, max_batch=2, n_pages=4,
                            page_size=16)
    rid = eng.submit([5, 17, 3], 10, stop=[base[4:6]])
    assert eng.run()[rid] == _expected_stop(base, [base[4:6]])


def test_spec_engine_accepts_stop_rejects_bias():
    from mop_tpu.serving import SpecDecodeEngine
    model, params = _setup()
    dmodel, dparams = _setup(use_quartet=False)
    base = _reference(model, params, [5, 17, 3], 10)
    eng = SpecDecodeEngine(model, params, dmodel, dparams, max_batch=2,
                           gamma=2)
    rid = eng.submit([5, 17, 3], 10, stop=[base[4:6]])
    assert eng.run()[rid] == _expected_stop(base, [base[4:6]])
    with pytest.raises(ValueError, match="logit_bias"):
        eng.submit([1, 2], 4, logit_bias={3: 1.0})
