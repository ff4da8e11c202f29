"""Regex -> token-DFA guided decoding (serving/regex_dfa.py).

``regex_to_dfa(pattern, token_strs)`` lifts an anchored character regex
to a token-level DFA; emitted token ids, decoded through ``token_strs``
and concatenated, must fully match the pattern, then EOS. Pinned here
against ``re.fullmatch`` as the oracle: language equality on exhaustive
short strings, multi-character tokens that cross char-state boundaries,
pruning of vocabularies that dead-end, parse errors, and end-to-end
engine + HTTP drives on the batched logit-mask path.

Beyond-reference capability (the reference has no generation at all,
SURVEY §0; its GPT stops at teacher-forced logits,
``mop/models/gpt_mop.py:181-207``).
"""

import itertools
import re

import jax
import jax.numpy as jnp
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_baseline
from mop_tpu.serving import DecodeEngine, regex_to_dfa

EOS = 0


def _lang(dfa, max_len):
    """All token-id sequences of length <= max_len the DFA accepts
    (ending in an accepting state)."""
    out = []
    frontier = [((), dfa.init_state())]
    for _ in range(max_len):
        nxt = []
        for seq, st in frontier:
            for tok in dfa.allowed(st):
                s2 = dfa.advance(st, tok)
                nxt.append((seq + (tok,), s2))
                if dfa.accepts(s2):
                    out.append(seq + (tok,))
        frontier = nxt
    if dfa.accepts(dfa.init_state()):
        out.append(())
    return sorted(out)


def _oracle(pattern, token_strs, max_len):
    """All token-id sequences of length <= max_len whose decoded
    concatenation fullmatches ``pattern`` (brute force)."""
    ids = [i for i, s in enumerate(token_strs) if s]
    out = []
    for n in range(max_len + 1):
        for seq in itertools.product(ids, repeat=n):
            if re.fullmatch(pattern, "".join(token_strs[i] for i in seq)):
                out.append(seq)
    return sorted(out)


@pytest.mark.parametrize("pattern", [
    "(xy|z)",
    "[0-9]{2,3}",
    "a+b?",
    "(ab)*c",
    "[^ab]c",
    "x|yz{2}",
    r"\d\d",
    "a.c",
])
def test_language_equals_re_fullmatch_char_vocab(pattern):
    """Single-char vocabulary: the token DFA's language (short strings)
    is exactly re.fullmatch's."""
    vocab = ["", "a", "b", "c", "x", "y", "z", "0", "1", "9", "\n"]
    dfa = regex_to_dfa(pattern, vocab)
    assert _lang(dfa, 4) == _oracle(pattern, vocab, 4)


def test_multichar_tokens_cross_boundaries():
    """Multi-char tokens are legal iff every char step survives: 'ab'
    jumps two char states; 'abc' can finish '(ab)+c' in one edge."""
    vocab = ["", "a", "b", "c", "ab", "abc", "bc", "ca"]
    pattern = "(ab)+c"
    dfa = regex_to_dfa(pattern, vocab)
    assert _lang(dfa, 3) == _oracle(pattern, vocab, 3)
    # the one-token completion is present
    (tok_abc,) = [i for i, s in enumerate(vocab) if s == "abc"]
    assert (tok_abc,) in _lang(dfa, 1)


def test_unbounded_repetition_self_consistent():
    vocab = ["", "a", "aa", "b"]
    dfa = regex_to_dfa("a*b", vocab)
    assert _lang(dfa, 3) == _oracle("a*b", vocab, 3)


def test_vocab_cannot_realize_pattern():
    with pytest.raises(ValueError, match="cannot produce"):
        regex_to_dfa("[0-9]+", ["", "a", "b"])
    # partial progress that always dead-ends is pruned too: 'a' starts
    # 'ab' but nothing provides the 'b'
    with pytest.raises(ValueError, match="cannot produce"):
        regex_to_dfa("ab", ["", "a", "c"])


def test_parse_errors():
    for bad in ["(a", "a)", "[a", "*a", "a{3,1}", "a^b", "[z-a]", "a{x}"]:
        with pytest.raises(ValueError):
            regex_to_dfa(bad, ["a"])


def test_escapes_and_classes():
    vocab = ["", "a", "_", "7", " ", "\t", "."]
    for pattern in [r"\w\w", r"\s\S", r"\.", r"[\d_]+"]:
        dfa = regex_to_dfa(pattern, vocab)
        assert _lang(dfa, 3) == _oracle(pattern, vocab, 3)


def test_engine_decodes_into_the_regex_language():
    """End-to-end: a constrained request's decoded output fullmatches the
    pattern (greedy and sampled), co-batched with an unconstrained row."""
    vocab_strs = [""] * 50  # id -> string; EOS (0) and most ids inert
    for tid, s in zip([9, 14, 31, 40, 41], ["ab", "a", "b", "c", "abc"]):
        vocab_strs[tid] = s
    pattern = "(ab)+c"
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=32)
    model = create_gpt_baseline(50, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    eng = DecodeEngine(model, params, max_batch=4, eos_id=EOS,
                       rng=jax.random.PRNGKey(3))
    dfa = regex_to_dfa(pattern, vocab_strs)
    r_g = eng.submit([5, 17, 3], 12, constraint=dfa)
    r_s = eng.submit([2, 4, 6], 12, temperature=1.3, top_k=10,
                     constraint=dfa)
    r_free = eng.submit([7, 8], 6, eos_id=-1)
    res = eng.run()
    for rid in (r_g, r_s):
        toks = res[rid]
        assert toks[-1] == EOS
        text = "".join(vocab_strs[t] for t in toks[:-1])
        assert re.fullmatch(pattern, text), (toks, text)
    assert len(res[r_free]) == 6  # unconstrained row unaffected


def test_http_guided_regex():
    """HTTP front-end: guided_regex compiles against the server's
    token_strs; a server without token_strs rejects it."""
    import json
    import urllib.error
    import urllib.request

    from mop_tpu.serving import ServingServer

    vocab_strs = [""] * 50
    for tid, s in zip([9, 14, 31], ["yes", "no", "maybe"]):
        vocab_strs[tid] = s
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=32)
    model = create_gpt_baseline(50, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    eng = DecodeEngine(model, params, max_batch=2, eos_id=EOS)
    srv = ServingServer(eng, token_strs=vocab_strs)
    srv.start()

    def post(port, body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            json.dumps(body).encode(),
            {"Content-Type": "application/json"})
        return json.loads(urllib.request.urlopen(req, timeout=120).read())

    try:
        out = post(srv.port,
                   {"prompt": [3, 1, 4], "max_new_tokens": 8, "eos_id": EOS,
                    "guided_regex": "(yes|no)"})
        assert out["tokens"][-1] == EOS and out["tokens"][:-1] in [[9], [14]]
    finally:
        srv.stop()

    srv2 = ServingServer(eng)  # no token_strs
    srv2.start()
    try:
        post(srv2.port, {"prompt": [1], "max_new_tokens": 4, "eos_id": EOS,
                         "guided_regex": "(yes|no)"})
        assert False, "expected 400 without server token_strs"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    finally:
        srv2.stop()
