"""Multi-step decoding: k tokens per device dispatch, token-identical.

The serving engines' measured tok/s is dispatch-latency-bound
(benchmarks/serving.md); ``step(n_tokens=k)`` amortizes that latency by
scanning k fixed-shape steps inside one jitted call. The contract pinned
here: the emitted tokens (greedy, sampled, seeded, penalized) are
IDENTICAL to single-step serving — the rng stream, per-row samplers,
penalty counts, and seeded positions advance per inner step exactly as k
``step()`` calls would — and every per-token host control (EOS, stop
sequences, budget) still lands on the right token.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import (TransformerConfig, create_gpt_mop_causal,
                            create_gpt_quartet)
from mop_tpu.serving import DecodeEngine

VOCAB = 47


def _mk(block=64, mop=False):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=block,
                            use_quartet=not mop)
    maker = create_gpt_mop_causal if mop else create_gpt_quartet
    model = maker(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


JOBS = [
    (dict(prompt=[5, 17, 3], max_new_tokens=21), {}),
    (dict(prompt=[9, 8, 7, 6], max_new_tokens=13),
     dict(temperature=0.9, seed=42)),
    (dict(prompt=[1, 4], max_new_tokens=17),
     dict(temperature=0.7, top_k=12, seed=7, repetition_penalty=1.3)),
]


def _serve(model, params, n_tokens, jobs=JOBS, **ekw):
    eng = DecodeEngine(model, params, max_batch=4, **ekw)
    rids = [eng.submit(**j, **kw) for j, kw in jobs]
    out = eng.run(n_tokens=n_tokens)
    return [out[r] for r in rids], eng


@pytest.mark.parametrize("mop", [False, True])
@pytest.mark.parametrize("k", [4, 8, 64])
def test_multistep_equals_single_step(mop, k):
    """Greedy + seeded-sampled + penalized requests, co-batched: burst
    serving emits the same tokens (k larger than any budget just caps)."""
    model, params = _mk(mop=mop)
    ref, _ = _serve(model, params, 1)
    got, eng = _serve(model, params, k)
    assert got == ref
    # the bursts actually amortized dispatches
    assert eng.engine_steps < sum(j["max_new_tokens"]
                                  for j, _ in JOBS)


def test_multistep_eos_and_stop_trim_mid_burst():
    """A row hitting EOS or a multi-token stop inside a burst retires at
    that token; later burst tokens are discarded."""
    model, params = _mk()
    ref, _ = _serve(model, params, 1)
    eos_tok = ref[0][5]  # force request 0 to end at its 6th token
    jobs = [(dict(prompt=[5, 17, 3], max_new_tokens=21,
                  eos_id=int(eos_tok)), {}),
            (dict(prompt=[9, 8, 7, 6], max_new_tokens=13,
                  stop=[ref[1][3:5]]), dict(temperature=0.9, seed=42))]
    r1, _ = _serve(model, params, 1, jobs=jobs)
    r8, _ = _serve(model, params, 8, jobs=jobs)
    assert r8 == r1                      # burst == single, post-trim
    # both retired EARLY at the triggering token (the repeated-token
    # stream may hit the eos value before index 5 — single-step truth
    # r1 defines where; the burst must land on the same token)
    assert len(r8[0]) < 21 and r8[0][-1] == int(eos_tok)
    assert len(r8[1]) < 13 and r8[1][-2:] == ref[1][3:5]


def test_multistep_logprobs_stay_aligned():
    model, params = _mk()
    ref, eng1 = _serve(model, params, 1, logprobs_topk=2)
    got, eng8 = _serve(model, params, 8, logprobs_topk=2)
    assert got == ref
    for rid in eng1.results:
        assert len(eng8.logprobs[rid]) == len(eng8.results[rid])
        np.testing.assert_allclose(eng8.logprobs[rid],
                                   eng1.logprobs[rid], atol=1e-5)


def test_multistep_falls_back_for_constraints():
    """A live constrained request sits the burst out PER-SLOT (round 5:
    the DFA mask updates between its own single steps while co-tenants
    keep bursting — dispatch counts pinned in
    tests/test_serving_paged_multistep.py) — results stay correct."""
    from mop_tpu.serving.constrain import choices

    model, params = _mk()
    eos = VOCAB - 1
    con = choices([[4, 2], [4, 9, 9]])
    eng = DecodeEngine(model, params, max_batch=2, eos_id=eos)
    r_c = eng.submit([5, 1], max_new_tokens=8, constraint=con)
    r_g = eng.submit([9, 8, 7], max_new_tokens=8)
    out = eng.run(n_tokens=8)
    assert out[r_c] in ([4, 2, eos], [4, 9, 9, eos])
    solo = DecodeEngine(model, params, max_batch=2, eos_id=eos)
    sr = solo.submit([9, 8, 7], max_new_tokens=8)
    assert solo.run()[sr] == out[r_g]


def test_multistep_midflight_admission():
    """New arrivals admit between bursts and still match single-step."""
    model, params = _mk()
    eng = DecodeEngine(model, params, max_batch=3)
    r0 = eng.submit([5, 17, 3], max_new_tokens=24)
    eng.step(n_tokens=6)
    r1 = eng.submit([2, 2, 4], max_new_tokens=10)
    out = eng.run(n_tokens=6)
    ref, _ = _serve(model, params, 1,
                    jobs=[(dict(prompt=[5, 17, 3], max_new_tokens=24), {}),
                          (dict(prompt=[2, 2, 4], max_new_tokens=10), {})])
    assert out[r0] == ref[0] and out[r1] == ref[1]


def test_whisper_multistep_equals_single():
    """WhisperServingEngine bursts are token-identical too (greedy
    engine; EOS mid-burst trims)."""
    from mop_tpu.models import WhisperConfig, create_whisper_mop
    from mop_tpu.serving import WhisperServingEngine

    wc = WhisperConfig(n_mels=8, n_audio_ctx=16, vocab_size=24,
                       n_text_ctx=24, n_embd=32, n_head=2,
                       n_layer_enc=1, n_layer_dec=1, dropout=0.0)
    model = create_whisper_mop(wc)
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 16, 8)),
                        jnp.zeros((1, 4), jnp.int32))
    rs = np.random.RandomState(0)
    mels = [rs.randn(1, 16, 8).astype(np.float32) for _ in range(3)]

    def serve(n_tokens, eos=None):
        eng = WhisperServingEngine(model, params, max_batch=2,
                                   bos_token=1, eos_id=eos)
        rids = [eng.submit(m, max_new_tokens=17) for m in mels]
        out = eng.run(n_tokens=n_tokens)
        return [out[r] for r in rids]

    assert serve(8) == serve(1)
    # EOS mid-burst: trim to the single-step truth
    first = serve(1)[0]
    eos_tok = first[4]
    assert serve(8, eos=int(eos_tok)) == serve(1, eos=int(eos_tok))
