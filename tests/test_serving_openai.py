"""OpenAI-compatible API layer: field mapping, stop trimming, streaming
chunk shapes, and equality with the native engine drive.

The reference has no serving stack (SURVEY §0); the OpenAI surface is
part of the production layer around it (serving/openai_api.py)."""

import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from mop_tpu.data import ByteBPETokenizer
from mop_tpu.models import TransformerConfig, create_gpt_quartet
from mop_tpu.serving import DecodeEngine, ServingServer
from mop_tpu.serving.openai_api import (
    StopTrimmer,
    default_chat_template,
    finalize,
    parse_chat,
    parse_completion,
)

CORPUS = ("the quick brown fox jumps over the lazy dog. "
          "pack my box with five dozen liquor jugs. ") * 8


# ---------------- pure translation units (no HTTP) ----------------


class _IdTok:
    """Identity-ish tokenizer stub: chars <-> their codepoints."""

    def encode(self, s):
        return [ord(c) for c in s]

    def decode(self, ids):
        return "".join(chr(i) for i in ids)


def test_parse_completion_maps_fields():
    p = parse_completion(
        {"prompt": "ab", "max_tokens": 9, "temperature": 0.5,
         "top_p": 0.9, "presence_penalty": 0.1, "frequency_penalty": 0.2,
         "logit_bias": {"7": -1.5}, "stop": ["x"], "echo": True},
        _IdTok())
    assert p["prompt_ids"] == [97, 98] and p["max_new"] == 9
    assert p["kw"]["temperature"] == 0.5 and p["kw"]["top_p"] == 0.9
    assert p["kw"]["logit_bias"] == {7: -1.5}
    assert p["kw"]["stop"] == [[120]] and p["stop_strs"] == ["x"]
    assert p["echo"] and not p["stream"]
    # token-id prompts are OpenAI-legal
    assert parse_completion({"prompt": [97, 98]},
                            _IdTok())["prompt_text"] == "ab"


@pytest.mark.parametrize("bad", [
    {"prompt": "a", "n": 9},                 # n capped at 8
    {"prompt": "a", "best_of": 9},       # best_of capped at 8
    {"prompt": "a", "logprobs": 9},      # > 5 alternatives
    {"prompt": "a", "logprobs": True},   # completions take an int
    {"prompt": "a", "suffix": "!"},
    {"prompt": "a", "stop": ["a", "b", "c", "d", "e"]},
    {"prompt": ""},
    {"prompt": {"not": "legal"}},
    {},
])
def test_parse_completion_rejects(bad):
    with pytest.raises((ValueError, TypeError)):
        parse_completion(bad, _IdTok())


def test_parse_response_format():
    schema = {"type": "object", "properties": {"ok": {"type": "boolean"}}}
    p = parse_completion(
        {"prompt": "a",
         "response_format": {"type": "json_schema",
                             "json_schema": {"name": "out",
                                             "schema": schema}}},
        _IdTok())
    assert p["json_schema"] == schema
    # type 'text' and absent response_format are no-ops
    assert parse_completion({"prompt": "a", "response_format":
                             {"type": "text"}}, _IdTok())["json_schema"] \
        is None
    assert parse_completion({"prompt": "a"}, _IdTok())["json_schema"] is None
    # chat carries it too
    c = parse_chat({"messages": [{"role": "user", "content": "hi"}],
                    "response_format": {"type": "json_schema",
                                        "json_schema": {"schema": schema}}},
                   _IdTok())
    assert c["json_schema"] == schema
    for bad in ({"type": "json_object"},          # can't honor exactly
                {"type": "json_schema"},          # missing schema
                {"type": "json_schema", "json_schema": {"schema": 3}},
                "json",                           # not an object
                {"no_type": 1}):
        with pytest.raises(ValueError):
            parse_completion({"prompt": "a", "response_format": bad},
                             _IdTok())


def test_parse_chat_renders_template():
    msgs = [{"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi"}]
    p = parse_chat({"messages": msgs}, _IdTok())
    assert p["prompt_text"] == "system: be brief\nuser: hi\nassistant:"
    assert p["prompt_text"] == default_chat_template(msgs)
    custom = parse_chat({"messages": msgs}, _IdTok(),
                        template=lambda m: m[-1]["content"])
    assert custom["prompt_text"] == "hi"
    with pytest.raises(ValueError):
        parse_chat({"messages": []}, _IdTok())
    with pytest.raises(ValueError):
        parse_chat({"messages": [{"role": "user"}]}, _IdTok())


def test_finalize_trims_eos_and_stop():
    tok = _IdTok()
    # eos (id 0) trimmed, finish=stop
    assert finalize([104, 105, 0], tok, 0, []) == ("hi", "stop")
    # stop string cut, finish=stop even without eos
    assert finalize([104, 105, 33, 122], tok, 0, ["!"]) == ("hi", "stop")
    # neither -> length
    assert finalize([104, 105], tok, 0, []) == ("hi", "length")


def test_stop_trimmer_holds_prefixes_and_cuts():
    t = StopTrimmer(["END"])
    assert t.feed("abcE") == "abc"      # 'E' could begin END -> held
    assert t.feed("N") == ""            # 'EN' still ambiguous
    assert t.feed("Dxyz") == ""         # match: cut, tail discarded
    assert t.hit and t.feed("more") == ""
    t2 = StopTrimmer(["END"])
    assert t2.feed("abcE") == "abc"
    assert t2.feed("Nd") == "ENd"       # disambiguated -> released
    assert t2.flush() == "" and not t2.hit
    t3 = StopTrimmer([])
    assert t3.feed("anything") == "anything"


# ---------------- HTTP end-to-end ----------------


@pytest.fixture(scope="module")
def oai_server():
    tok = ByteBPETokenizer.train(CORPUS, vocab_size=300)
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=96)
    model = create_gpt_quartet(tok.vocab_size, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    eng = DecodeEngine(model, params, max_batch=2)
    srv = ServingServer(eng, tokenizer=tok, model_name="mop-test")
    srv.start()
    yield tok, eng, srv
    srv.stop()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _sse(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    events, done = [], False
    with urllib.request.urlopen(req, timeout=120) as r:
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            body = line[len("data: "):]
            if body == "[DONE]":
                done = True
                break
            events.append(json.loads(body))
    return events, done


def test_v1_models(oai_server):
    tok, eng, srv = oai_server
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/v1/models", timeout=30) as r:
        body = json.loads(r.read())
    assert body["object"] == "list"
    assert body["data"][0]["id"] == "mop-test"


def test_v1_completions_matches_native(oai_server):
    tok, eng, srv = oai_server
    text = "the quick brown"
    out = _post(srv.port, "/v1/completions",
                {"prompt": text, "max_tokens": 8})
    native = _post(srv.port, "/generate",
                   {"text": text, "max_new_tokens": 8})
    assert out["object"] == "text_completion"
    assert out["choices"][0]["text"] == native["text"]
    assert out["choices"][0]["finish_reason"] == "length"
    assert out["usage"] == {
        "prompt_tokens": len(tok.encode(text)),
        "completion_tokens": 8, "total_tokens": len(tok.encode(text)) + 8}
    # token-id prompt gives the same completion
    by_ids = _post(srv.port, "/v1/completions",
                   {"prompt": tok.encode(text), "max_tokens": 8})
    assert by_ids["choices"][0]["text"] == out["choices"][0]["text"]
    # echo prepends the prompt text
    echoed = _post(srv.port, "/v1/completions",
                   {"prompt": text, "max_tokens": 8, "echo": True})
    assert echoed["choices"][0]["text"] == text + out["choices"][0]["text"]


def test_v1_completions_stop_trimming(oai_server):
    tok, eng, srv = oai_server
    text = "pack my box"
    free = _post(srv.port, "/v1/completions",
                 {"prompt": text, "max_tokens": 12})["choices"][0]["text"]
    assert len(free) > 3
    stop = free[2:5]  # a substring the model will definitely emit
    out = _post(srv.port, "/v1/completions",
                {"prompt": text, "max_tokens": 12, "stop": stop})
    c = out["choices"][0]
    assert c["finish_reason"] == "stop"
    assert c["text"] == free[:free.find(stop)]
    assert stop not in c["text"]


def test_v1_chat_completions(oai_server):
    tok, eng, srv = oai_server
    msgs = [{"role": "user", "content": "the quick"}]
    out = _post(srv.port, "/v1/chat/completions",
                {"messages": msgs, "max_tokens": 6})
    assert out["object"] == "chat.completion"
    m = out["choices"][0]["message"]
    assert m["role"] == "assistant" and isinstance(m["content"], str)
    assert out["usage"]["prompt_tokens"] == \
        len(tok.encode(default_chat_template(msgs)))
    # equals a native drive of the rendered template
    native = _post(srv.port, "/generate",
                   {"text": default_chat_template(msgs),
                    "max_new_tokens": 6})
    assert m["content"] == native["text"]


def test_v1_completions_streaming_matches_blocking(oai_server):
    tok, eng, srv = oai_server
    payload = {"prompt": "five dozen", "max_tokens": 10}
    blocking = _post(srv.port, "/v1/completions", payload)
    events, done = _sse(srv.port, "/v1/completions",
                        dict(payload, stream=True))
    assert done
    assert all(e["object"] == "text_completion" for e in events)
    joined = "".join(e["choices"][0]["text"] for e in events)
    assert joined == blocking["choices"][0]["text"]
    assert events[-1]["choices"][0]["finish_reason"] == "length"
    assert all(e["choices"][0]["finish_reason"] is None
               for e in events[:-1])


def test_v1_chat_streaming_shapes(oai_server):
    tok, eng, srv = oai_server
    msgs = [{"role": "user", "content": "lazy dog"}]
    blocking = _post(srv.port, "/v1/chat/completions",
                     {"messages": msgs, "max_tokens": 8})
    events, done = _sse(srv.port, "/v1/chat/completions",
                        {"messages": msgs, "max_tokens": 8,
                         "stream": True})
    assert done
    assert all(e["object"] == "chat.completion.chunk" for e in events)
    assert events[0]["choices"][0]["delta"] == {"role": "assistant"}
    joined = "".join(e["choices"][0]["delta"].get("content", "")
                     for e in events)
    assert joined == blocking["choices"][0]["message"]["content"]
    assert events[-1]["choices"][0]["finish_reason"] in ("stop", "length")


def test_v1_rejects_unsupported(oai_server):
    tok, eng, srv = oai_server
    for payload in ({"prompt": "a", "n": 9},
                    {"prompt": "a", "logprobs": 1},
                    {"messages": "nope"},
                    {"prompt": "a", "max_tokens": 0}):
        path = ("/v1/chat/completions" if "messages" in payload
                else "/v1/completions")
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, path, payload)
        assert e.value.code == 400
        err = json.loads(e.value.read())
        assert err["error"]["type"] == "invalid_request_error"


def test_v1_requires_tokenizer():
    cfg = TransformerConfig(n_layer=1, n_head=2, n_embd=32, dropout=0.0,
                            block_size=32)
    model = create_gpt_quartet(50, cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    srv = ServingServer(DecodeEngine(model, params, max_batch=1))
    srv.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, "/v1/completions", {"prompt": "hi"})
        assert e.value.code == 400
    finally:
        srv.stop()


def test_v1_response_format_json_schema():
    """response_format json_schema end-to-end: the completion's content
    json.loads-parses and satisfies the schema (key order, types), for
    both /v1/completions and /v1/chat/completions; json_object is 400."""
    from mop_tpu.data import CharTokenizer

    tok = CharTokenizer(sorted(set(
        '{}[]":,-0123456789truefalsenulxyokag bhi\n')))
    schema = {"type": "object", "properties": {
        "ok": {"type": "boolean"},
        "tag": {"enum": ["x", "y"]},
    }}
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=96)
    model = create_gpt_quartet(tok.vocab_size, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    eng = DecodeEngine(model, params, max_batch=2, eos_id=tok.eos_id)
    srv = ServingServer(eng, tokenizer=tok, model_name="mop-json")
    srv.start()
    rf = {"type": "json_schema",
          "json_schema": {"name": "out", "schema": schema}}
    try:
        out = _post(srv.port, "/v1/completions",
                    {"prompt": "hi", "max_tokens": 48,
                     "response_format": rf})
        c = out["choices"][0]
        obj = json.loads(c["text"])
        assert list(obj) == ["ok", "tag"]
        assert isinstance(obj["ok"], bool) and obj["tag"] in ("x", "y")
        assert c["finish_reason"] == "stop"  # DFA accepted -> EOS

        chat = _post(srv.port, "/v1/chat/completions",
                     {"messages": [{"role": "user", "content": "go"}],
                      "max_tokens": 48, "response_format": rf})
        obj = json.loads(chat["choices"][0]["message"]["content"])
        assert list(obj) == ["ok", "tag"]

        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, "/v1/completions",
                  {"prompt": "hi", "max_tokens": 8,
                   "response_format": {"type": "json_object"}})
        assert e.value.code == 400
    finally:
        srv.stop()


def test_v1_logprobs():
    """Completions logprobs (int alternatives) and chat logprobs
    (true + top_logprobs): arrays are 1:1 with the visible tokens,
    greedy top-1 equals the chosen token, text_offset re-assembles the
    completion text; validation errors are 400."""
    tok = ByteBPETokenizer.train(CORPUS, vocab_size=300)
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=96)
    model = create_gpt_quartet(tok.vocab_size, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    eng = DecodeEngine(model, params, max_batch=2, logprobs_topk=5)
    srv = ServingServer(eng, tokenizer=tok, model_name="mop-lp")
    srv.start()
    try:
        out = _post(srv.port, "/v1/completions",
                    {"prompt": "the quick", "max_tokens": 6,
                     "logprobs": 2})
        c = out["choices"][0]
        lp = c["logprobs"]
        assert len(lp["tokens"]) == len(lp["token_logprobs"]) == \
            len(lp["top_logprobs"]) == len(lp["text_offset"]) == 6
        assert "".join(lp["tokens"]) == c["text"]
        assert all(v <= 0 for v in lp["token_logprobs"])
        for tstr, tlp, alts in zip(lp["tokens"], lp["token_logprobs"],
                                   lp["top_logprobs"]):
            # string-keyed dict: distinct ids decoding to the same string
            # (partial UTF-8) collapse, so <= 2 entries
            assert 1 <= len(alts) <= 2
            best = max(alts.items(), key=lambda kv: kv[1])
            assert best[0] == tstr  # greedy: chosen == top-1
            assert abs(best[1] - tlp) < 1e-6
        # offsets re-assemble the text
        for s, off in zip(lp["tokens"], lp["text_offset"]):
            assert c["text"][off:off + len(s)] == s

        chat = _post(srv.port, "/v1/chat/completions",
                     {"messages": [{"role": "user", "content": "hi"}],
                      "max_tokens": 5, "logprobs": True,
                      "top_logprobs": 3})
        ch = chat["choices"][0]
        entries = ch["logprobs"]["content"]
        assert len(entries) == 5
        assert "".join(e["token"] for e in entries) == \
            ch["message"]["content"]
        for e in entries:
            assert len(e["top_logprobs"]) == 3
            assert e["top_logprobs"][0]["token"] == e["token"]

        # logprobs: 0 -> chosen-token logprobs, no alternatives
        out0 = _post(srv.port, "/v1/completions",
                     {"prompt": "pack", "max_tokens": 3, "logprobs": 0})
        lp0 = out0["choices"][0]["logprobs"]
        assert lp0["top_logprobs"] is None
        assert len(lp0["token_logprobs"]) == 3

        for bad in ({"prompt": "a", "max_tokens": 2, "logprobs": 9},
                    {"prompt": "a", "max_tokens": 2, "logprobs": 2,
                     "stream": True},
                    {"messages": [{"role": "user", "content": "x"}],
                     "top_logprobs": 2}):
            path = ("/v1/chat/completions" if "messages" in bad
                    else "/v1/completions")
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(srv.port, path, bad)
            assert e.value.code == 400
    finally:
        srv.stop()


def test_v1_logprobs_requires_tracking_engine():
    tok = ByteBPETokenizer.train(CORPUS, vocab_size=300)
    cfg = TransformerConfig(n_layer=1, n_head=2, n_embd=32, dropout=0.0,
                            block_size=32)
    model = create_gpt_quartet(tok.vocab_size, cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    srv = ServingServer(DecodeEngine(model, params, max_batch=1),
                        tokenizer=tok)
    srv.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, "/v1/completions",
                  {"prompt": "hi", "max_tokens": 2, "logprobs": 1})
        assert e.value.code == 400
        assert "logprobs_topk" in json.loads(e.value.read()
                                             )["error"]["message"]
    finally:
        srv.stop()


def test_v1_n_choices(oai_server):
    """n > 1: independent engine requests batched on the slot pool;
    greedy gives n identical choices, sampling gives distinct ones;
    usage counts the prompt once and completions across choices."""
    tok, eng, srv = oai_server
    out = _post(srv.port, "/v1/completions",
                {"prompt": "the quick", "max_tokens": 6, "n": 3})
    ch = out["choices"]
    assert [c["index"] for c in ch] == [0, 1, 2]
    assert len({c["text"] for c in ch}) == 1  # greedy: all identical
    assert out["usage"]["completion_tokens"] == 18
    assert out["usage"]["prompt_tokens"] == len(tok.encode("the quick"))
    assert out["usage"]["total_tokens"] == \
        len(tok.encode("the quick")) + 18

    sampled = _post(srv.port, "/v1/completions",
                    {"prompt": "the", "max_tokens": 8, "n": 4,
                     "temperature": 1.5})
    assert len({c["text"] for c in sampled["choices"]}) > 1

    chat = _post(srv.port, "/v1/chat/completions",
                 {"messages": [{"role": "user", "content": "hi"}],
                  "max_tokens": 4, "n": 2})
    assert len(chat["choices"]) == 2
    assert all(c["message"]["role"] == "assistant"
               for c in chat["choices"])

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.port, "/v1/completions", {"prompt": "a", "n": 9})
    assert e.value.code == 400


def test_v1_n_streaming(oai_server):
    """n > 1 streaming: the choices' chunks interleave on one SSE
    stream, each with its index; every choice gets its own finish
    chunk; reassembled text equals the blocking response (greedy)."""
    tok, eng, srv = oai_server
    blocking = _post(srv.port, "/v1/completions",
                     {"prompt": "the quick", "max_tokens": 6, "n": 2})
    events, done = _sse(srv.port, "/v1/completions",
                        {"prompt": "the quick", "max_tokens": 6, "n": 2,
                         "stream": True})
    assert done
    texts, finishes = {0: "", 1: ""}, {}
    for ev in events:
        c = ev["choices"][0]
        texts[c["index"]] += c["text"]
        if c["finish_reason"]:
            finishes[c["index"]] = c["finish_reason"]
    assert sorted(finishes) == [0, 1]
    for i in (0, 1):
        assert texts[i] == blocking["choices"][i]["text"]

    # chat: per-choice role chunk, then content deltas with indexes
    events, done = _sse(srv.port, "/v1/chat/completions",
                        {"messages": [{"role": "user", "content": "hi"}],
                         "max_tokens": 4, "n": 2, "stream": True})
    assert done
    roles = [ev["choices"][0]["index"] for ev in events
             if ev["choices"][0]["delta"].get("role")]
    assert sorted(roles) == [0, 1]


def test_best_of_order_unit():
    from mop_tpu.serving.openai_api import best_of_order
    # ranked by MEAN logprob, not sum (a short good candidate beats a
    # long mediocre one)
    assert best_of_order([[-1.0, -1.0], [-0.5], [-2.0, -2.0]]) == [1, 0, 2]
    # ties keep submit order; an empty candidate ranks last
    assert best_of_order([[-1.0], [-1.0], []]) == [0, 1, 2]


def test_parse_best_of_rules():
    p = parse_completion({"prompt": "a", "best_of": 3, "n": 2}, _IdTok())
    assert p["best_of"] == 3 and p["n"] == 2
    # best_of defaults to n (no extra candidates)
    assert parse_completion({"prompt": "a", "n": 2},
                            _IdTok())["best_of"] == 2
    for bad in ({"prompt": "a", "best_of": 2, "n": 3},   # best_of < n
                {"prompt": "a", "best_of": 9},           # > 8
                {"prompt": "a", "best_of": 2, "stream": True}):
        with pytest.raises(ValueError):
            parse_completion(bad, _IdTok())
    with pytest.raises(ValueError):  # completions-only parameter
        parse_chat({"messages": [{"role": "user", "content": "x"}],
                    "best_of": 2}, _IdTok())


def test_v1_best_of():
    """best_of candidates decode server-side as one batch; the n with
    the highest mean token logprob come back (in rank order); usage
    bills every candidate."""
    tok = ByteBPETokenizer.train(CORPUS, vocab_size=300)
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=96)
    model = create_gpt_quartet(tok.vocab_size, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    eng = DecodeEngine(model, params, max_batch=4, logprobs_topk=1)
    srv = ServingServer(eng, tokenizer=tok, model_name="mop-bo")
    srv.start()
    try:
        out = _post(srv.port, "/v1/completions",
                    {"prompt": "the quick", "max_tokens": 5,
                     "best_of": 3})
        assert len(out["choices"]) == 1
        assert out["usage"]["completion_tokens"] == 15  # 3 candidates
        assert out["usage"]["prompt_tokens"] == \
            len(tok.encode("the quick"))

        # sampled, n=2 of best_of=4: choices arrive in rank order
        # (index 0 is the best candidate)
        out = _post(srv.port, "/v1/completions",
                    {"prompt": "the", "max_tokens": 6, "best_of": 4,
                     "n": 2, "temperature": 1.5, "logprobs": 0})
        assert [c["index"] for c in out["choices"]] == [0, 1]
        assert out["usage"]["completion_tokens"] == 24
        means = [sum(c["logprobs"]["token_logprobs"]) /
                 len(c["logprobs"]["token_logprobs"])
                 for c in out["choices"]]
        assert means[0] >= means[1] - 1e-9
    finally:
        srv.stop()


def test_v1_best_of_requires_tracking_engine(oai_server):
    tok, eng, srv = oai_server  # engine built without logprobs_topk
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.port, "/v1/completions",
              {"prompt": "hi", "max_tokens": 2, "best_of": 2})
    assert e.value.code == 400
    assert "logprobs_topk" in json.loads(e.value.read()
                                         )["error"]["message"]


def test_parse_tools_rules():
    msgs = {"messages": [{"role": "user", "content": "x"}]}
    tools = [{"type": "function",
              "function": {"name": "add", "parameters": {
                  "type": "object",
                  "properties": {"x": {"type": "integer"}}}}},
             {"type": "function", "function": {"name": "nop"}}]
    # required -> union over the tools, in listing order
    p = parse_chat({**msgs, "tools": tools, "tool_choice": "required"},
                   _IdTok())
    assert p["tools"]["mode"] == "forced"
    assert [t[0] for t in p["tools"]["tools"]] == ["add", "nop"]
    # a named function -> that branch only
    p = parse_chat({**msgs, "tools": tools,
                    "tool_choice": {"type": "function",
                                    "function": {"name": "nop"}}},
                   _IdTok())
    assert p["tools"] == {"mode": "forced", "tools": [("nop", None)]}
    # auto (explicit or the OpenAI default with tools present) -> the
    # free-text-or-tool union constraint
    for r in ({**msgs, "tools": tools},
              {**msgs, "tools": tools, "tool_choice": "auto"}):
        p = parse_chat(r, _IdTok())
        assert p["tools"]["mode"] == "auto"
        assert [t[0] for t in p["tools"]["tools"]] == ["add", "nop"]
    # none -> tools ignored entirely
    assert parse_chat({**msgs, "tools": tools, "tool_choice": "none"},
                      _IdTok())["tools"] is None
    for bad in ({**msgs, "tools": [], "tool_choice": "required"},
                {**msgs, "tool_choice": "required"},         # no tools
                {**msgs, "tools": [{"type": "function"}],
                 "tool_choice": "required"},
                {**msgs, "tools": tools,
                 "tool_choice": {"type": "function",
                                 "function": {"name": "ghost"}}},
                {**msgs, "tools": tools, "tool_choice": "required",
                 "stream": True}):
        with pytest.raises(ValueError):
            parse_chat(bad, _IdTok())
    # chat-only parameter
    with pytest.raises(ValueError):
        parse_completion({"prompt": "a", "tools": tools,
                          "tool_choice": "required"}, _IdTok())


def test_tool_call_regex_language():
    from mop_tpu.serving.json_schema import tool_call_regex
    import re as _re
    rx = tool_call_regex([
        ("add", {"type": "object",
                 "properties": {"x": {"type": "integer"}}}),
        ("nop", None)])
    pat = _re.compile(rx.replace("\\{", "[{]").replace("\\}", "[}]"))
    assert pat.fullmatch('{"name":"add","arguments":{"x":3}}')
    assert pat.fullmatch('{"name":"nop","arguments":{}}')
    assert not pat.fullmatch('{"name":"add","arguments":{}}')
    assert not pat.fullmatch('{"name":"nop","arguments":{"x":3}}')
    assert not pat.fullmatch('{"name":"ghost","arguments":{}}')


def test_v1_tool_calls():
    """Forced tool calls end-to-end: tool_choice 'required' over two
    tools -> message.tool_calls[0] names one of them and its arguments
    json-parse and satisfy THAT tool's parameter schema; finish_reason
    'tool_calls', content null. usage/logprob paths untouched."""
    from mop_tpu.data import CharTokenizer

    tok = CharTokenizer(sorted(set(
        '{}":,-0123456789 adnopxmeurgtsfl\n')))
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=96)
    model = create_gpt_quartet(tok.vocab_size, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    eng = DecodeEngine(model, params, max_batch=2, eos_id=tok.eos_id)
    srv = ServingServer(eng, tokenizer=tok, model_name="mop-tools")
    srv.start()
    # bounded argument languages (boolean/enum) so greedy constrained
    # decoding must reach an accepting state inside the token budget
    # (an unbounded integer can ride digits past max_tokens)
    tools = [{"type": "function",
              "function": {"name": "add", "parameters": {
                  "type": "object",
                  "properties": {"x": {"enum": [1, 2, 3]}}}}},
             {"type": "function", "function": {"name": "nop"}}]
    try:
        out = _post(srv.port, "/v1/chat/completions",
                    {"messages": [{"role": "user", "content": "go"}],
                     "max_tokens": 64, "tools": tools,
                     "tool_choice": "required"})
        c = out["choices"][0]
        assert c["finish_reason"] == "tool_calls"
        assert c["message"]["content"] is None
        call = c["message"]["tool_calls"][0]
        assert call["type"] == "function"
        name = call["function"]["name"]
        args = json.loads(call["function"]["arguments"])
        assert name in ("add", "nop")
        if name == "add":
            assert list(args) == ["x"] and args["x"] in (1, 2, 3)
        else:
            assert args == {}

        # forced single tool: that tool comes back
        out = _post(srv.port, "/v1/chat/completions",
                    {"messages": [{"role": "user", "content": "go"}],
                     "max_tokens": 64, "tools": tools,
                     "tool_choice": {"type": "function",
                                     "function": {"name": "add"}}})
        call = out["choices"][0]["message"]["tool_calls"][0]
        assert call["function"]["name"] == "add"

        # truncation: 3 tokens cannot finish the JSON -> plain content
        out = _post(srv.port, "/v1/chat/completions",
                    {"messages": [{"role": "user", "content": "go"}],
                     "max_tokens": 3, "tools": tools,
                     "tool_choice": "required"})
        c = out["choices"][0]
        assert c["finish_reason"] == "length"
        assert "tool_calls" not in c["message"]

        # tool_choice none: tools ignored, ordinary completion
        out = _post(srv.port, "/v1/chat/completions",
                    {"messages": [{"role": "user", "content": "go"}],
                     "max_tokens": 4, "tools": tools,
                     "tool_choice": "none"})
        assert out["choices"][0]["message"]["content"] is not None

        for bad in ({"messages": [{"role": "user", "content": "g"}],
                     "max_tokens": 4, "tools": tools,
                     "tool_choice": "required",
                     "response_format": {"type": "json_schema",
                                         "json_schema": {"schema": {
                                             "type": "integer"}}}},):
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(srv.port, "/v1/chat/completions", bad)
            assert e.value.code == 400

        # tool_choice auto, steered AWAY from the '{' trigger: the model
        # decides, free text comes back as a plain content choice
        ban = {str(tok.encode("{")[0]): -100}
        out = _post(srv.port, "/v1/chat/completions",
                    {"messages": [{"role": "user", "content": "go"}],
                     "max_tokens": 8, "tools": tools,
                     "tool_choice": "auto", "logit_bias": ban})
        c = out["choices"][0]
        assert "tool_calls" not in c["message"]
        assert isinstance(c["message"]["content"], str)
        assert not c["message"]["content"].startswith('{"')

        # tool_choice auto, unconstrained model: the response is EITHER
        # plain content or a complete, schema-valid tool call — never a
        # malformed call (the union-DFA invariant)
        out = _post(srv.port, "/v1/chat/completions",
                    {"messages": [{"role": "user", "content": "go"}],
                     "max_tokens": 64, "tools": tools,
                     "tool_choice": "auto"})
        c = out["choices"][0]
        if c["finish_reason"] == "tool_calls":
            call = c["message"]["tool_calls"][0]
            assert call["function"]["name"] in ("add", "nop")
            json.loads(call["function"]["arguments"])
        else:
            assert c["message"]["content"] is not None
    finally:
        srv.stop()


def test_tool_call_auto_dfa_semantics():
    """The auto union DFA: free text flows unconstrained (EOS legal
    anywhere off the trigger), but once the output commits to the
    '{\"' trigger the only legal continuations spell a complete tool
    call for one of the tools."""
    from mop_tpu.serving.json_schema import tool_call_auto_to_dfa

    vocab = sorted(set('{}":,abdnoprgumentsx123 \n'))
    dfa = tool_call_auto_to_dfa(
        [("add", {"type": "object",
                  "properties": {"x": {"enum": [1, 2]}}}),
         ("nop", None)], vocab)
    enc = {ch: i for i, ch in enumerate(vocab)}

    def walk(text):
        s = dfa.init_state()
        for ch in text:
            s = dfa.advance(s, enc[ch])
            if s is None:
                return None
        return s

    # free text: accepting (EOS legal) at every non-trigger point —
    # INCLUDING multi-line answers (the regex engine's '.' excludes
    # newline; the union uses (.|\n)* so line breaks stay legal)
    for t in ("", "abba", "{", "{x", "ab{\"x", "ab\nba", "\n\nab",
              "{x\nx"):
        s = walk(t)
        assert s is not None and dfa.accepts(s), repr(t)
    # committed to the trigger: NOT accepting, and the only allowed
    # next char after '{"' is 'n' (both tool names start with n... no —
    # 'a' for add too). The allowed set must be exactly the tool-name
    # first chars + nothing free.
    s = walk('{"')
    assert s is not None and not dfa.accepts(s)
    allowed = {vocab[t] for t in dfa.allowed(s)}
    assert allowed == {"n"}  # '{"name":' — the literal key comes next
    # a complete call accepts; a wrong-schema call dead-ends
    s = walk('{"name":"nop","arguments":{}}')
    assert s is not None and dfa.accepts(s)
    assert walk('{"name":"nop","arguments":{"x":1}}') is None
    s = walk('{"name":"add","arguments":{"x":1}}')
    assert s is not None and dfa.accepts(s)
    assert walk('{"name":"add","arguments":{"x":3}}') is None


def test_v1_stream_options_include_usage(oai_server):
    """stream_options.include_usage: data chunks carry usage: null and
    one final pre-[DONE] chunk has empty choices + the full usage
    (equal to the blocking response's)."""
    tok, eng, srv = oai_server
    blocking = _post(srv.port, "/v1/completions",
                     {"prompt": "the quick", "max_tokens": 5})
    events, done = _sse(srv.port, "/v1/completions",
                        {"prompt": "the quick", "max_tokens": 5,
                         "stream": True,
                         "stream_options": {"include_usage": True}})
    assert done
    assert all("usage" in ev for ev in events)
    *data, last = events
    assert all(ev["usage"] is None for ev in data)
    assert last["choices"] == []
    assert last["usage"] == blocking["usage"]

    # without the flag no usage key appears anywhere
    events, _ = _sse(srv.port, "/v1/completions",
                     {"prompt": "the quick", "max_tokens": 4,
                      "stream": True})
    assert all("usage" not in ev for ev in events)

    for bad in ({"prompt": "a", "stream_options":
                 {"include_usage": True}},              # requires stream
                {"prompt": "a", "stream": True,
                 "stream_options": {"continuous": 1}},  # unknown key
                {"prompt": "a", "stream": True,
                 "stream_options": "yes"}):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, "/v1/completions", bad)
        assert e.value.code == 400
