"""Continuous-batching decode engine (beyond-reference serving layer).

The load-bearing property: mixing unrelated requests at different
positions in one fixed-shape batched step emits EXACTLY the tokens the
single-stream ``generate_cached`` sampler would emit for each request
alone — per-row independence of the batched math.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import (TransformerConfig, create_gpt_baseline,
                            create_gpt_quartet, generate_cached)
from mop_tpu.serving import DecodeEngine


def _setup(use_quartet=True, block=32, vocab=50):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=block)
    mk = create_gpt_quartet if use_quartet else create_gpt_baseline
    model = mk(vocab, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


def _reference_tokens(model, params, prompt, max_new):
    out = generate_cached(model, params, jnp.asarray(prompt, jnp.int32)[None],
                          max_new_tokens=max_new)
    return np.asarray(out)[0, len(prompt):].tolist()


def test_single_request_matches_generate_cached():
    model, params = _setup()
    prompt = [5, 17, 3, 41, 2, 9]
    eng = DecodeEngine(model, params, max_batch=4)
    rid = eng.submit(prompt, max_new_tokens=10)
    results = eng.run()
    assert eng.is_done(rid)
    assert results[rid] == _reference_tokens(model, params, prompt, 10)


@pytest.mark.parametrize("use_quartet", [True, False])
def test_staggered_requests_each_match_single_stream(use_quartet):
    """Three requests with different prompt lengths and budgets, the third
    submitted mid-flight — every stream must equal its solo decode."""
    model, params = _setup(use_quartet)
    prompts = {0: [1, 2, 3], 1: [7, 8, 9, 10, 11, 12, 13], 2: [40, 41]}
    budgets = {0: 12, 1: 6, 2: 9}
    eng = DecodeEngine(model, params, max_batch=4)
    r0 = eng.submit(prompts[0], budgets[0])
    r1 = eng.submit(prompts[1], budgets[1])
    eng.step()
    eng.step()
    r2 = eng.submit(prompts[2], budgets[2])
    results = eng.run()
    for rid, key in ((r0, 0), (r1, 1), (r2, 2)):
        want = _reference_tokens(model, params, prompts[key], budgets[key])
        assert results[rid] == want, f"request {key} diverged"
        assert len(results[rid]) == budgets[key]


def test_slot_reuse_under_oversubscription():
    """More requests than slots: the engine must queue, admit as slots
    free, and still produce per-stream-correct tokens."""
    model, params = _setup()
    rng = np.random.RandomState(0)
    prompts = [rng.randint(0, 50, size=rng.randint(2, 8)).tolist()
               for _ in range(5)]
    eng = DecodeEngine(model, params, max_batch=2)
    rids = [eng.submit(p, 5) for p in prompts]
    peak = 0
    while eng.n_queued or eng.n_active:
        eng.step()
        peak = max(peak, eng.n_active)
    assert peak <= 2
    for rid, p in zip(rids, prompts):
        assert eng.results[rid] == _reference_tokens(model, params, p, 5)


def test_eos_retires_request():
    model, params = _setup()
    prompt = [5, 17, 3]
    ref = _reference_tokens(model, params, prompt, 12)
    # pick as "EOS" a token value whose FIRST occurrence is as late as
    # possible (greedy decodes on random init often cycle)
    first_seen = {t: i for i, t in reversed(list(enumerate(ref)))}
    eos, idx = max(first_seen.items(), key=lambda kv: kv[1])
    eng = DecodeEngine(model, params, max_batch=2, eos_id=eos)
    rid = eng.submit(prompt, max_new_tokens=12)
    results = eng.run()
    assert results[rid] == ref[:idx + 1]  # stops AT the eos token
    assert eng.is_done(rid)


def test_window_bound_retires_request():
    model, params = _setup(block=16)
    prompt = list(range(1, 13))  # t0=12, block=16 -> at most 4 appends
    eng = DecodeEngine(model, params, max_batch=1)
    rid = eng.submit(prompt, max_new_tokens=50)
    results = eng.run()
    assert eng.is_done(rid)
    assert len(results[rid]) == 16 - 12 + 1  # tok0 at t0..block-1 positions


def test_max_new_tokens_one_completes_on_admission():
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=1)
    rid = eng.submit([3, 4], max_new_tokens=1)
    out = eng.step()
    assert eng.is_done(rid) and len(out[rid]) == 1
    assert out[rid] == _reference_tokens(model, params, [3, 4], 1)


def test_engine_accepts_quantized_params():
    from mop_tpu.ops.quant import quantize_params

    model, params = _setup()
    qp = quantize_params(params, min_size=0)
    eng = DecodeEngine(model, qp, max_batch=2)
    rid = eng.submit([5, 6, 7], max_new_tokens=6)
    results = eng.run()
    assert len(results[rid]) == 6
    # int8 engine matches int8 single-stream decode
    want = np.asarray(generate_cached(
        model, qp, jnp.asarray([[5, 6, 7]], jnp.int32),
        max_new_tokens=6))[0, 3:].tolist()
    assert results[rid] == want


def test_submit_validates_inputs():
    model, params = _setup(block=16)
    eng = DecodeEngine(model, params, max_batch=1)
    with pytest.raises(ValueError, match="prompt length"):
        eng.submit(list(range(16)), 4)  # t0 == block
    with pytest.raises(ValueError, match="max_new_tokens"):
        eng.submit([1, 2], 0)

def test_cancel_queued_request_never_runs():
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=1)
    r0 = eng.submit([1, 2, 3], 6)
    r1 = eng.submit([4, 5], 6)       # queued behind r0 (one slot)
    r2 = eng.submit([6, 7, 8], 6)
    assert eng.cancel(r1)
    results = eng.run()
    assert eng.is_done(r1) and results[r1] == []
    # the surviving requests are unaffected
    assert results[r0] == _reference_tokens(model, params, [1, 2, 3], 6)
    assert results[r2] == _reference_tokens(model, params, [6, 7, 8], 6)


def test_cancel_active_request_frees_slot():
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=1)
    r0 = eng.submit([1, 2, 3], 20)
    r1 = eng.submit([4, 5], 5)        # waits for the only slot
    eng.step()
    eng.step()
    got = len(eng.results[r0])
    assert 0 < got < 20
    assert eng.cancel(r0)
    results = eng.run()
    # partial tokens retained and correct (a prefix of the solo stream)
    want = _reference_tokens(model, params, [1, 2, 3], 20)
    assert results[r0] == want[:got] and eng.is_done(r0)
    # the freed slot served the queued request, tokens unaffected
    assert results[r1] == _reference_tokens(model, params, [4, 5], 5)


def test_cancel_unknown_or_finished_is_noop():
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=1)
    rid = eng.submit([1, 2], 3)
    eng.run()
    assert not eng.cancel(rid)
    assert not eng.cancel(999)
    assert eng.results[rid] == _reference_tokens(model, params, [1, 2], 3)


def test_token_and_step_counters():
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=2)
    eng.submit([1, 2, 3], 4)
    eng.submit([4, 5], 6)
    eng.run()
    assert eng.tokens_generated == 10
    # the longer stream: 1 admission-emitted token + 5 decode rounds
    assert eng.engine_steps == 5

def test_per_request_sampling_params_batched():
    """Greedy rows are unaffected by sampled neighbors; top_k=1 and a
    tiny top_p nucleus both reduce to greedy even at high temperature."""
    model, params = _setup()
    p0, p1, p2, p3 = [1, 2, 3], [7, 8, 9, 10], [40, 41], [5, 6, 7]
    eng = DecodeEngine(model, params, max_batch=4)
    r0 = eng.submit(p0, 8)                               # engine default: greedy
    r1 = eng.submit(p1, 8, temperature=1.5, top_k=8)     # genuinely sampled
    r2 = eng.submit(p2, 8, temperature=5.0, top_k=1)     # degenerates to greedy
    r3 = eng.submit(p3, 8, temperature=2.0, top_p=1e-9)  # nucleus = top token
    res = eng.run()
    assert res[r0] == _reference_tokens(model, params, p0, 8)
    assert res[r2] == _reference_tokens(model, params, p2, 8)
    assert res[r3] == _reference_tokens(model, params, p3, 8)
    assert len(res[r1]) == 8 and all(0 <= t < 50 for t in res[r1])


def test_per_request_eos():
    model, params = _setup()
    ref = _reference_tokens(model, params, [1, 2, 3], 10)
    eos = ref[3]
    stop = ref.index(eos)  # first occurrence ends the stream
    eng = DecodeEngine(model, params, max_batch=2)
    r0 = eng.submit([1, 2, 3], 10, eos_id=eos)
    r1 = eng.submit([1, 2, 3], 10)  # same prompt, no eos: runs to budget
    res = eng.run()
    assert res[r0] == ref[:stop + 1]
    assert res[r1] == ref


def test_sampling_param_validation():
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=1)
    for kw in ({"temperature": -1.0}, {"top_k": -2},
               {"top_p": 0.0}, {"top_p": 1.5}):
        with pytest.raises(ValueError):
            eng.submit([1, 2], 4, **kw)


def test_submit_validates_vocab_range():
    """Out-of-vocab ids are rejected at submit (not inside the stepping
    thread, where the raise would kill the server's device worker)."""
    model, params = _setup()
    eng = DecodeEngine(model, params, max_batch=1)
    v = model.vocab_size
    with pytest.raises(ValueError, match="outside vocab"):
        eng.submit([1, v], 4)
    with pytest.raises(ValueError, match="outside vocab"):
        eng.submit([1, -3], 4)
    with pytest.raises(ValueError, match="outside vocab"):
        eng.submit([1, 2], 4, eos_id=v)
    eng.submit([1, 2], 1, eos_id=-1)  # negative = explicit "never fires"
    with pytest.raises(ValueError, match="outside vocab"):
        eng.submit([1, 2], 4, stop=[[3, v + 7]])
    # boundary ids are fine
    rid = eng.submit([0, v - 1], 2, eos_id=v - 1, stop=[[v - 1, 0]])
    assert len(eng.run()[rid]) <= 2
