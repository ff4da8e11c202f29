"""Per-request beam search in the continuous-batching engine.

The exactness contract (VERDICT r3 #3): an engine request with
``num_beams=k`` returns the SAME tokens as ``models.beam.generate_beam``
single-stream — beams are k adjacent rows of the same fixed-shape step,
the host keeps the hypothesis set, and one extra device dispatch permutes
the group's cache rows by parent — and it survives co-batching with
ordinary greedy/sampled requests. The reference has no decode loop at all
(SURVEY §0).
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_quartet
from mop_tpu.models.beam import generate_beam
from mop_tpu.models.generate import generate_cached
from mop_tpu.serving import DecodeEngine

VOCAB = 37


@pytest.fixture(scope="module")
def setup():
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=64)
    model = create_gpt_quartet(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


def _beam_ref(model, params, prompt, max_new, k, eos=None, lenpen=1.0):
    """Single-stream oracle: best beam + pad-stripped token list."""
    seqs, _ = generate_beam(model, params,
                            jnp.asarray([prompt], jnp.int32), max_new,
                            num_beams=k, eos_id=eos,
                            length_penalty=lenpen, return_all=True)
    best = np.asarray(seqs[0, 0, len(prompt):])
    if eos is not None:
        hit = np.nonzero(best == eos)[0]
        if hit.size:
            best = best[: hit[0] + 1]
    return [int(t) for t in best]


@pytest.mark.parametrize("k,eos,lenpen", [(2, None, 1.0), (3, 5, 1.0),
                                          (3, 5, 0.0), (4, None, 2.0)])
def test_engine_beam_matches_generate_beam(setup, k, eos, lenpen):
    model, params = setup
    prompt = [7, 3, 11, 2]
    eng = DecodeEngine(model, params, max_batch=4, max_beams=4)
    rid = eng.submit(prompt, max_new_tokens=12, eos_id=eos, num_beams=k,
                     length_penalty=lenpen)
    got = eng.run()[rid]
    want = _beam_ref(model, params, prompt, 12, k, eos, lenpen)
    assert got == want


def test_engine_beam_cobatched_with_sampled(setup):
    """A beam group sharing the slot pool with greedy and seeded-sampled
    requests: every request matches its solo result."""
    model, params = setup
    eng = DecodeEngine(model, params, max_batch=6, max_beams=3)
    r_greedy = eng.submit([1, 2, 3], max_new_tokens=10)
    r_beam = eng.submit([7, 3, 11, 2], max_new_tokens=12, num_beams=3)
    r_seeded = eng.submit([4, 4, 9], max_new_tokens=10, temperature=0.9,
                          seed=123)
    out = eng.run()
    assert out[r_beam] == _beam_ref(model, params, [7, 3, 11, 2], 12, 3)
    solo_g = generate_cached(model, params,
                             jnp.asarray([[1, 2, 3]], jnp.int32), 10)
    assert out[r_greedy] == [int(t) for t in np.asarray(solo_g[0, 3:])]
    eng2 = DecodeEngine(model, params, max_batch=6, max_beams=3)
    r2 = eng2.submit([4, 4, 9], max_new_tokens=10, temperature=0.9,
                     seed=123)
    assert out[r_seeded] == eng2.run()[r2]


def test_engine_beam_head_of_line_then_drains(setup):
    """A k=4 beam request arriving when only 2 slots are free waits, then
    admits once earlier requests retire; results still exact."""
    model, params = setup
    eng = DecodeEngine(model, params, max_batch=4, max_beams=4)
    r_a = eng.submit([1, 2], max_new_tokens=3)
    r_b = eng.submit([2, 3], max_new_tokens=3)
    eng.step()  # both admitted into 2 of the 4 slots
    r_beam = eng.submit([7, 3, 11, 2], max_new_tokens=8, num_beams=4)
    out = eng.run()
    assert len(out[r_a]) == 3 and len(out[r_b]) == 3
    assert out[r_beam] == _beam_ref(model, params, [7, 3, 11, 2], 8, 4)


def test_engine_beam_num_beams_1_is_plain_greedy(setup):
    model, params = setup
    eng = DecodeEngine(model, params, max_batch=2, max_beams=2)
    rid = eng.submit([5, 6, 7], max_new_tokens=8, num_beams=1)
    got = eng.run()[rid]
    solo = generate_cached(model, params,
                           jnp.asarray([[5, 6, 7]], jnp.int32), 8)
    assert got == [int(t) for t in np.asarray(solo[0, 3:])]


def test_engine_beam_gpt_mop_causal():
    """Beam search over the causal-gate GPT_MoP — the namesake model gets
    the full decode feature set."""
    from mop_tpu.models import create_gpt_mop_causal

    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=48, use_quartet=False)
    model = create_gpt_mop_causal(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    eng = DecodeEngine(model, params, max_batch=3, max_beams=3)
    rid = eng.submit([7, 3, 11], max_new_tokens=10, num_beams=3)
    got = eng.run()[rid]
    assert got == _beam_ref(model, params, [7, 3, 11], 10, 3)


def test_beam_validation(setup):
    model, params = setup
    eng = DecodeEngine(model, params, max_batch=4, max_beams=2)
    with pytest.raises(ValueError):  # k > max_beams
        eng.submit([1, 2], max_new_tokens=4, num_beams=3)
    with pytest.raises(ValueError):  # sampling override
        eng.submit([1, 2], max_new_tokens=4, num_beams=2, temperature=0.7)
    with pytest.raises(ValueError):  # constraint-like extras
        eng.submit([1, 2], max_new_tokens=4, num_beams=2, seed=3)
    with pytest.raises(ValueError):  # window overflow (no early retire)
        eng.submit([1, 2], max_new_tokens=100, num_beams=2)
    off = DecodeEngine(model, params, max_batch=4)  # max_beams=0
    with pytest.raises(ValueError):
        off.submit([1, 2], max_new_tokens=4, num_beams=2)
    with pytest.raises(ValueError):  # paged engine: dense-only feature
        from mop_tpu.serving import PagedDecodeEngine
        peng = PagedDecodeEngine(model, params, max_batch=2, n_pages=8,
                                 page_size=8)
        peng.submit([1, 2], max_new_tokens=4, num_beams=2)


def test_openai_num_beams_extension(setup):
    """/v1/completions with the num_beams extension field returns the
    beam-search best sequence (engine-exact)."""
    import json
    import urllib.request

    from mop_tpu.data import CharTokenizer
    from mop_tpu.serving import ServingServer

    tok = CharTokenizer(sorted(set("abcdefg \n")))
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=64)
    model = create_gpt_quartet(tok.vocab_size, cfg)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32))
    eng = DecodeEngine(model, params, max_batch=4, max_beams=3,
                       eos_id=tok.eos_id)
    srv = ServingServer(eng, tokenizer=tok, model_name="beam")
    srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            json.dumps({"prompt": "abcab", "max_tokens": 10,
                        "num_beams": 3, "length_penalty": 0.5}).encode(),
            {"Content-Type": "application/json"})
        out = json.load(urllib.request.urlopen(req))
        text = out["choices"][0]["text"]
        want = _beam_ref(model, params, tok.encode("abcab"), 10, 3,
                         eos=tok.eos_id, lenpen=0.5)
        if want and want[-1] == tok.eos_id:
            want = want[:-1]
        assert text == tok.decode(want)
        # stream + beams is rejected
        import urllib.error
        bad = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            json.dumps({"prompt": "ab", "max_tokens": 4, "num_beams": 2,
                        "stream": True}).encode(),
            {"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad)
        assert e.value.code == 400
    finally:
        srv.stop()


def test_beam_logprobs_engine_rejected_and_k1_is_greedy(setup):
    """code-review r4: beams on a logprobs-tracking engine would break
    the results/logprobs 1:1 invariant -> rejected; num_beams=1 forces
    greedy even on a sampling-default engine."""
    model, params = setup
    lp_eng = DecodeEngine(model, params, max_batch=4, max_beams=2,
                          logprobs_topk=2)
    with pytest.raises(ValueError, match="logprobs"):
        lp_eng.submit([1, 2], max_new_tokens=4, num_beams=2)
    # num_beams=1 on a temperature-0.9 engine: deterministic greedy
    samp = DecodeEngine(model, params, max_batch=2, max_beams=2,
                        temperature=0.9, rng=jax.random.PRNGKey(5))
    r = samp.submit([5, 6, 7], max_new_tokens=8, num_beams=1)
    got = samp.run()[r]
    solo = generate_cached(model, params,
                           jnp.asarray([[5, 6, 7]], jnp.int32), 8)
    assert got == [int(t) for t in np.asarray(solo[0, 3:])]
    with pytest.raises(ValueError):
        samp.submit([1, 2], max_new_tokens=4, num_beams=1,
                    temperature=0.7)
