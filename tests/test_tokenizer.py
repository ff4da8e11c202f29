"""Tokenizers: byte-BPE round-trip/merge/persistence contracts, char
vocab, and text-mode HTTP serving (encode server-side, decoded responses,
UTF-8-safe streamed pieces, regex guidance compiled against the
tokenizer's vocabulary).

The reference has no text pipeline (its GPT consumes integer ids,
`/root/reference/mop/models/gpt_mop.py:181-207`); these pin the contracts
of the serving-completing tokenizer layer.
"""

import json
import re
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from mop_tpu.data import ByteBPETokenizer, CharTokenizer

CORPUS = (
    "the quick brown fox jumps over the lazy dog. "
    "the dog sleeps; the fox runs. pack my box with five dozen jugs. "
    "naive café déjà-vu — übermäßig 東京 🚀 again and again the fox. "
) * 20


@pytest.fixture(scope="module")
def bpe():
    return ByteBPETokenizer.train(CORPUS, vocab_size=320)


TRICKY = [
    "plain ascii text",
    "tabs\tand\nnewlines\r\n",
    "underscores _like_this_ and snake_case",
    "emoji 🚀🎉 and flags 🇯🇵",
    "accents: café déjà naïve øre",
    "CJK: 東京都 新宿区",
    "mixed 123 numbers, 4.5e-6! #hash @at 'quotes' \"double\"",
    "never-seen-in-corpus: zygomorphic QWERTYUIOP ꙮ",
    "",
]


@pytest.mark.parametrize("text", TRICKY)
def test_bpe_round_trip_exact(bpe, text):
    """Byte fallback guarantees exact round-trip for ANY string, in or
    out of the training domain."""
    assert bpe.decode(bpe.encode(text)) == text


def test_bpe_learns_compression(bpe):
    """In-domain text encodes to far fewer tokens than raw bytes."""
    text = "the quick brown fox jumps over the lazy dog"
    ids = bpe.encode(text)
    assert len(ids) < 0.7 * len(text.encode("utf-8"))
    # every id is in range and not a special
    assert all(0 <= i < bpe.vocab_size - 1 for i in ids)


def test_bpe_training_deterministic():
    a = ByteBPETokenizer.train(CORPUS, vocab_size=300)
    b = ByteBPETokenizer.train(CORPUS, vocab_size=300)
    assert a._ranks == b._ranks
    t = "the lazy fox café"
    assert a.encode(t) == b.encode(t)


def test_bpe_save_load_round_trip(bpe, tmp_path):
    p = str(tmp_path / "tok.json")
    bpe.save(p)
    loaded = ByteBPETokenizer.load(p)
    for text in TRICKY:
        assert loaded.encode(text) == bpe.encode(text)
    assert loaded.vocab_size == bpe.vocab_size
    assert loaded.eos_id == bpe.eos_id


def test_bpe_specials(bpe):
    assert bpe.eos_id == bpe.vocab_size - 1
    # encode never emits the special; decode skips it
    ids = bpe.encode("the fox")
    assert bpe.eos_id not in ids
    assert bpe.decode(ids + [bpe.eos_id]) == "the fox"


def test_bpe_token_strs_contract(bpe):
    """token_strs[i] is the decoded text of id i ('' for specials and
    lone UTF-8 fragment bytes) — the regex_to_dfa vocabulary contract."""
    strs = bpe.token_strs
    assert len(strs) == bpe.vocab_size
    assert strs[bpe.eos_id] == ""
    ids = bpe.encode("the fox runs")
    assert "".join(strs[i] for i in ids) == "the fox runs"
    # a lone continuation byte (0x9f) is not text on its own
    assert strs[0x9F] == ""
    assert strs[ord("a")] == "a"


def test_bpe_stream_decoder_multibyte_safe(bpe):
    text = "café 🚀 東京 done"
    ids = bpe.encode(text)
    dec = bpe.stream_decoder()
    pieces = [dec.feed(i) for i in ids]
    assert "".join(pieces) + dec.flush() == text
    # no piece ever contains a replacement char (no split codepoints)
    assert all("�" not in p for p in pieces)


def test_bpe_vocab_size_too_small():
    with pytest.raises(ValueError):
        ByteBPETokenizer.train("abc", vocab_size=255)


def test_char_tokenizer_round_trip_and_unk():
    tok = CharTokenizer.from_corpus("hello world")
    ids = tok.encode("hello")
    assert tok.decode(ids) == "hello"
    # unseen char maps to unk, decodes to ''
    ids = tok.encode("hello!")
    assert ids[-1] == tok.special_id("<unk>")
    assert tok.decode(ids) == "hello"
    strict = CharTokenizer.from_corpus("hello world", unk=None)
    with pytest.raises(ValueError):
        strict.encode("hello!")


def test_char_tokenizer_save_load(tmp_path):
    tok = CharTokenizer.from_corpus("abcabc xyz")
    p = str(tmp_path / "char.json")
    tok.save(p)
    loaded = CharTokenizer.load(p)
    assert loaded.encode("abc xyz!") == tok.encode("abc xyz!")
    assert loaded.vocab_size == tok.vocab_size
    assert loaded.eos_id == tok.eos_id


# ---------------- HTTP text mode ----------------


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def text_server():
    from mop_tpu.models import TransformerConfig, create_gpt_quartet
    from mop_tpu.serving import DecodeEngine, ServingServer

    tok = ByteBPETokenizer.train(CORPUS, vocab_size=300)
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=96)
    model = create_gpt_quartet(tok.vocab_size, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    eng = DecodeEngine(model, params, max_batch=2)
    srv = ServingServer(eng, tokenizer=tok)
    srv.start()
    yield tok, model, params, srv
    srv.stop()


def test_http_text_prompt_matches_token_prompt(text_server):
    tok, model, params, srv = text_server
    text = "the quick brown fox"
    by_text = _post(srv.port, {"text": text, "max_new_tokens": 8})
    by_ids = _post(srv.port, {"prompt": tok.encode(text),
                              "max_new_tokens": 8})
    assert by_text["tokens"] == by_ids["tokens"]
    assert by_text["text"] == tok.decode(by_text["tokens"])
    assert "text" not in by_ids  # id-mode responses stay id-only


def test_http_text_request_validation(text_server):
    tok, _, _, srv = text_server
    import urllib.error
    for payload in ({"text": ""},  # encodes to zero tokens
                    {"text": "ok", "prompt": [1, 2]}):  # both given
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, payload)
        assert e.value.code == 400


def test_http_text_streaming_pieces_join(text_server):
    tok, _, _, srv = text_server
    text = "the lazy dog"
    blocking = _post(srv.port, {"text": text, "max_new_tokens": 10})
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/generate",
        data=json.dumps({"text": text, "max_new_tokens": 10,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                events.append(json.loads(line[len("data: "):]))
    assert events[-1]["done"] is True
    assert [e["token"] for e in events if "token" in e] == blocking["tokens"]
    joined = "".join(e["text"] for e in events if "token" in e)
    assert joined == events[-1]["text"] == blocking["text"]


def test_http_guided_regex_via_tokenizer(text_server):
    """guided_regex compiles against the tokenizer vocabulary passed at
    server construction — the decoded output matches the pattern."""
    tok, _, _, srv = text_server
    pattern = r"(fox|dog)( runs| sleeps)"
    out = _post(srv.port, {"text": "the quick", "max_new_tokens": 16,
                           "eos_id": tok.eos_id, "guided_regex": pattern})
    assert out["tokens"][-1] == tok.eos_id
    assert re.fullmatch(pattern, out["text"])
