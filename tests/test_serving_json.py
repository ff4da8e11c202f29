"""JSON-schema guided decoding (serving/json_schema.py).

``json_schema_to_regex`` compiles a JSON-schema subset to an anchored
regex in regex_dfa's syntax; decoding under the lifted token DFA then
emits compact JSON satisfying the schema. Pinned here: positive and
negative fullmatch oracles per schema type, unsupported schemas are
REJECTED (never silently loosened), and an end-to-end engine drive
whose output json.loads-parses and type-checks against the schema.

Beyond-reference capability (the reference has no generation at all,
SURVEY §0; its GPT stops at teacher-forced logits,
``mop/models/gpt_mop.py:181-207``).
"""

import json
import re

import jax
import jax.numpy as jnp
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_baseline
from mop_tpu.serving import (DecodeEngine, json_schema_to_dfa,
                             json_schema_to_regex)

EOS = 0


def _full(schema, text):
    return re.fullmatch(json_schema_to_regex(schema), text) is not None


def test_scalar_types():
    assert _full({"type": "integer"}, "42")
    assert _full({"type": "integer"}, "-7")
    assert _full({"type": "integer"}, "0")
    assert not _full({"type": "integer"}, "007")
    assert not _full({"type": "integer"}, "1.5")
    assert _full({"type": "number"}, "-3.25e-2")
    assert _full({"type": "number"}, "10")
    assert not _full({"type": "number"}, ".5")
    assert _full({"type": "boolean"}, "true")
    assert not _full({"type": "boolean"}, "True")
    assert _full({"type": "null"}, "null")
    assert _full({"type": "string"}, '"hi there"')
    assert not _full({"type": "string"}, '"unterminated')
    assert not _full({"type": "string"}, '"no "quotes" inside"')


def test_string_bounds_and_pattern():
    s = {"type": "string", "minLength": 2, "maxLength": 3}
    assert not _full(s, '"a"') and _full(s, '"ab"') and _full(s, '"abc"')
    assert not _full(s, '"abcd"')
    p = {"type": "string", "pattern": "[0-9]{4}"}
    assert _full(p, '"2026"') and not _full(p, '"20"')
    with pytest.raises(ValueError, match="pattern"):
        json_schema_to_regex({"type": "string", "pattern": "a*",
                              "minLength": 1})


def test_enum_and_array():
    e = {"enum": ["red", "green", 3, True, None]}
    for ok in ['"red"', '"green"', "3", "true", "null"]:
        assert _full(e, ok)
    assert not _full(e, '"blue"') and not _full(e, "4")
    arr = {"type": "array", "items": {"type": "integer"}, "minItems": 1,
           "maxItems": 3}
    assert _full(arr, "[1]") and _full(arr, "[1,-2,30]")
    assert not _full(arr, "[]") and not _full(arr, "[1,2,3,4]")
    assert _full({"type": "array", "items": {"type": "boolean"}}, "[]")
    assert _full({"type": "array", "maxItems": 0, "minItems": 0}, "[]")


def test_object_nested():
    schema = {"type": "object", "properties": {
        "name": {"type": "string", "minLength": 1},
        "age": {"type": "integer"},
        "tags": {"type": "array", "items": {"enum": ["a", "b"]},
                 "maxItems": 2},
        "meta": {"type": "object",
                 "properties": {"ok": {"type": "boolean"}}},
    }}
    good = '{"name":"bo","age":44,"tags":["a","b"],"meta":{"ok":true}}'
    assert _full(schema, good)
    assert json.loads(good)["meta"]["ok"] is True
    # wrong key order / missing key / whitespace all rejected (compact,
    # fixed order)
    assert not _full(schema, '{"age":44,"name":"bo","tags":[],'
                             '"meta":{"ok":true}}')
    assert not _full(schema, '{"name":"bo","age":44,"tags":[]}')
    assert not _full(schema, good.replace(":", ": "))


def test_unsupported_schemas_rejected():
    for bad in ({"type": "object"},                      # no properties
                {"type": "object", "properties": {"a": {"type": "null"}},
                 "additionalProperties": True},
                {"type": "object", "properties": {"a": {"type": "null"}},
                 "required": ["b"]},
                {"enum": [{"x": 1}]},
                {"type": "frobnicate"},
                {"type": "array", "items": {"type": "integer"},
                 "minItems": 3, "maxItems": 2}):
        with pytest.raises(ValueError):
            json_schema_to_regex(bad)


def test_engine_emits_schema_valid_json():
    """End-to-end: decoding under the schema DFA emits text that
    json.loads-parses and satisfies the schema's types and key order."""
    # every field bounded so completion fits any budget (an unbounded
    # integer would let greedy decoding extend digits until truncation —
    # the same budget contract as unconstrained decoding)
    schema = {"type": "object", "properties": {
        "ok": {"type": "boolean"},
        "n": {"enum": [0, 12, 345]},
        "tag": {"enum": ["x", "y"]},
    }}
    alphabet = sorted(set('{}[]":,-0123456789truefalsxynul') | set("abe"))
    vocab_strs = [""] * (len(alphabet) + 8)
    for i, ch in enumerate(alphabet):
        vocab_strs[i + 4] = ch            # ids 4.. = single chars
    vocab_strs[-3] = '"ok":'              # a few multi-char tokens
    vocab_strs[-2] = "true"
    vocab_strs[-1] = '"tag":"'
    vocab = len(vocab_strs)
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=96)
    model = create_gpt_baseline(vocab, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    eng = DecodeEngine(model, params, max_batch=2, eos_id=EOS,
                       rng=jax.random.PRNGKey(9))
    dfa = json_schema_to_dfa(schema, vocab_strs)
    r_g = eng.submit([1, 2, 3], 64, constraint=dfa)
    r_s = eng.submit([3, 2, 1], 64, temperature=1.5, top_k=12,
                     constraint=dfa)
    res = eng.run()
    for rid in (r_g, r_s):
        toks = res[rid]
        assert toks[-1] == EOS
        text = "".join(vocab_strs[t] for t in toks[:-1])
        obj = json.loads(text)  # parses as real JSON
        assert list(obj) == ["ok", "n", "tag"]
        assert isinstance(obj["ok"], bool) and isinstance(obj["n"], int)
        assert obj["tag"] in ("x", "y")
