"""OpenAI `echo` + `logprobs`: prompt tokens scored, not just echoed.

Oracle: `prompt_logprobs` equals EXACTLY the composition of per-token
`decode_step_rows` calls from an empty cache — incremental-decode
semantics, the scale the engine's own generated-token logprobs live on.
Per-prefix `prefill` re-runs give near-identical values (ties at the
1e-3 level from the standardization-window difference; asserted close,
not equal). Upstream contract bits pinned: token_logprobs[0] and
top_logprobs[0] null, offsets start at the echoed text's position 0,
the completion tail identical to the non-echo response.
"""

import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_quartet
from mop_tpu.models.generate import init_decode_cache, prefill
from mop_tpu.serving import (DecodeEngine, ServingServer,
                             decode_step_rows, prompt_logprobs)

VOCAB = 50


@pytest.fixture(scope="module")
def setup():
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=64)
    model = create_gpt_quartet(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


def test_prompt_logprobs_exact_vs_step_composition(setup):
    """EXACT oracle: feed the prompt one token at a time through
    decode_step_rows (the engine's decode math) and score each next
    token from the returned logits."""
    model, params = setup
    prompt = [5, 17, 3, 41, 2, 9, 30]
    lps, tops = prompt_logprobs(model, params, prompt, n_top=3)
    assert lps[0] is None and tops[0] == []
    assert len(lps) == len(tops) == len(prompt)
    cache = init_decode_cache(model.config, 1)
    cache["len"] = jnp.zeros((1,), jnp.int32)
    for j in range(1, len(prompt)):
        logits, cache = decode_step_rows(
            model, params, cache, jnp.asarray([prompt[j - 1]], jnp.int32),
            jnp.asarray([j - 1], jnp.int32))
        cache["len"] = jnp.asarray([j], jnp.int32)
        row = jax.nn.log_softmax(logits[0].astype(jnp.float32))
        np.testing.assert_allclose(lps[j], float(row[prompt[j]]),
                                   rtol=1e-6, atol=1e-6)
        assert [t for t, _ in tops[j]] == \
            list(np.argsort(np.asarray(row))[::-1][:3])


def test_prompt_logprobs_close_to_per_prefix_prefill(setup):
    """Per-prefix prefill re-runs standardize every row over the query
    prefix — a near-identical but distinct window; values must agree to
    ~1e-2 (the quartet standardization-window sensitivity)."""
    model, params = setup
    prompt = [5, 17, 3, 41, 2, 9, 30]
    lps, _ = prompt_logprobs(model, params, prompt)
    for j in range(1, len(prompt)):
        logits, _ = prefill(model, params,
                            jnp.asarray(prompt[:j], jnp.int32)[None])
        row = jax.nn.log_softmax(logits[0].astype(jnp.float32))
        np.testing.assert_allclose(lps[j], float(row[prompt[j]]),
                                   atol=5e-2)


def test_prompt_logprobs_pad_invariance(setup):
    """Bucketing to T_pad must not change the scores (pad rows land
    beyond every real query's live prefix)."""
    model, params = setup
    short = [5, 17, 3]                        # bucket 8
    # the same 3 tokens lead a longer prompt -> bucket 16: the shared
    # positions' scores must be identical
    lps_a, _ = prompt_logprobs(model, params, short, n_top=0)
    lps_b, _ = prompt_logprobs(model, params,
                               short + list(range(1, 10)), n_top=0)
    np.testing.assert_allclose(lps_a[1:], lps_b[1:3], rtol=1e-6)
    with pytest.raises(ValueError):
        prompt_logprobs(model, params, [], n_top=1)
    with pytest.raises(ValueError):
        prompt_logprobs(model, params, [1] * 65, n_top=1)


class _Tok:
    def encode(self, s):
        return [ord(c) % VOCAB for c in s]

    def decode(self, toks):
        return "".join(chr(97 + (t % 26)) for t in toks)

    token_strs = [chr(97 + (i % 26)) for i in range(VOCAB)]


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_http_echo_logprobs(setup):
    model, params = setup
    eng = DecodeEngine(model, params, max_batch=2, logprobs_topk=3)
    srv = ServingServer(eng, tokenizer=_Tok())
    srv.start()
    try:
        base = {"model": "mop", "prompt": "abcd", "max_tokens": 5,
                "logprobs": 2}
        plain = _post(srv.port, base)
        echo = _post(srv.port, dict(base, echo=True))
        lp = echo["choices"][0]["logprobs"]
        n_prompt = 4
        # prompt entries prepended: null first, floats after
        assert lp["token_logprobs"][0] is None
        assert lp["top_logprobs"][0] is None
        assert all(isinstance(v, float)
                   for v in lp["token_logprobs"][1:])
        # echoed text leads the completion text
        assert echo["choices"][0]["text"].startswith("abcd")
        assert lp["text_offset"][0] == 0
        assert lp["text_offset"][:n_prompt] == [0, 1, 2, 3]
        # the completion tail is the non-echo response, shifted
        tail = lp["token_logprobs"][n_prompt:]
        np.testing.assert_allclose(
            tail, plain["choices"][0]["logprobs"]["token_logprobs"],
            rtol=1e-6)
        assert lp["tokens"][n_prompt:] == \
            plain["choices"][0]["logprobs"]["tokens"]
        # prompt scores agree with the scoring oracle
        want, _ = prompt_logprobs(model, params,
                                  [ord(c) % VOCAB for c in "abcd"], 2)
        np.testing.assert_allclose(lp["token_logprobs"][1:n_prompt],
                                   want[1:], rtol=1e-6)
    finally:
        srv.stop()
