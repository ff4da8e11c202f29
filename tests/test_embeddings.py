"""/v1/embeddings + EmbeddingModel: pooled hidden-state text vectors.

Pinned properties: unit norm; batch/pad INVARIANCE (causal attention +
masked pooling make right-padding exact, so a sequence embeds identically
solo, co-batched, and in any bucket); OpenAI body shapes incl. base64
packing and `dimensions` truncation. The reference has no inference
surface (SURVEY §0); this extends the serving layer around the same GPT
families.
"""

import base64
import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_quartet
from mop_tpu.serving import (DecodeEngine, EmbeddingModel, ServingServer,
                             embeddings_body, parse_embedding_input)

VOCAB = 50


@pytest.fixture(scope="module")
def setup():
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=64)
    model = create_gpt_quartet(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


def test_shapes_and_unit_norm(setup):
    model, params = setup
    emb = EmbeddingModel(model, params)
    vecs = emb.embed([[5, 17, 3], [9, 8, 7, 6], [1]])
    assert vecs.shape == (3, 32) and vecs.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=-1), 1.0,
                               rtol=1e-5)


def test_batch_and_pad_invariance(setup):
    """The same sequence embeds identically solo (tiny bucket),
    co-batched with longer neighbors (bigger bucket), and in any slot —
    causal attention + masked pooling make padding exact."""
    model, params = setup
    emb = EmbeddingModel(model, params)
    seq = [5, 17, 3, 41, 2]
    solo = emb.embed([seq])[0]
    long_neighbor = list(range(1, 30))          # forces a bigger T bucket
    batched = emb.embed([long_neighbor, seq, [7, 7]])[1]
    np.testing.assert_allclose(solo, batched, atol=2e-5)


def test_last_pool_differs_and_is_last_token_state(setup):
    model, params = setup
    mean_e = EmbeddingModel(model, params, pool="mean")
    last_e = EmbeddingModel(model, params, pool="last")
    seq = [5, 17, 3, 41]
    assert not np.allclose(mean_e.embed([seq])[0], last_e.embed([seq])[0])
    # last-pool is also pad-invariant
    a = last_e.embed([seq])[0]
    b = last_e.embed([list(range(1, 30)), seq])[1]
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_embed_validation(setup):
    model, params = setup
    emb = EmbeddingModel(model, params)
    with pytest.raises(ValueError):
        emb.embed([[]])
    with pytest.raises(ValueError):
        emb.embed([[1] * 65])          # > block_size
    with pytest.raises(ValueError):
        EmbeddingModel(model, params, pool="cls")
    assert emb.embed([]).shape == (0, 32)


class _Tok:
    def encode(self, s):
        return [ord(c) % VOCAB for c in s]

    def decode(self, toks):
        return "".join(chr(97 + (t % 26)) for t in toks)

    token_strs = [chr(97 + (i % 26)) for i in range(VOCAB)]


def test_parse_embedding_input_shapes():
    tok = _Tok()
    assert parse_embedding_input({"input": "ab"}, tok) == \
        [[ord("a") % VOCAB, ord("b") % VOCAB]]
    assert parse_embedding_input({"input": ["ab", "c"]}, tok)[1] == \
        [ord("c") % VOCAB]
    assert parse_embedding_input({"input": [1, 2, 3]}, None) == [[1, 2, 3]]
    assert parse_embedding_input({"input": [[1, 2], [3]]}, None) == \
        [[1, 2], [3]]
    for bad in ({}, {"input": []}, {"input": 7}, {"input": [7.5]},
                {"input": [["x"]]}):
        with pytest.raises(ValueError):
            parse_embedding_input(bad, tok)
    with pytest.raises(ValueError):  # string input without a tokenizer
        parse_embedding_input({"input": "ab"}, None)


def test_embeddings_body_base64_and_dimensions():
    vecs = np.asarray([[3.0, 4.0, 0.0, 0.0]], np.float32)
    body = embeddings_body(vecs, "m", 7)
    assert body["object"] == "list" and body["model"] == "m"
    assert body["usage"] == {"prompt_tokens": 7, "total_tokens": 7}
    assert body["data"][0]["embedding"] == [3.0, 4.0, 0.0, 0.0]
    b64 = embeddings_body(vecs, "m", 7, encoding_format="base64")
    unpacked = np.frombuffer(
        base64.b64decode(b64["data"][0]["embedding"]), "<f4")
    np.testing.assert_allclose(unpacked, vecs[0])
    # dimensions: truncate then re-normalize
    d2 = embeddings_body(vecs, "m", 7, dimensions=2)
    np.testing.assert_allclose(d2["data"][0]["embedding"], [0.6, 0.8],
                               rtol=1e-6)
    for kw in ({"encoding_format": "hex"}, {"dimensions": 0},
               {"dimensions": 5}):
        with pytest.raises(ValueError):
            embeddings_body(vecs, "m", 7, **kw)


def test_http_v1_embeddings(setup):
    model, params = setup
    eng = DecodeEngine(model, params, max_batch=2)
    srv = ServingServer(eng, tokenizer=_Tok(), model_name="mop-embed")
    srv.start()
    try:
        def post(payload, path="/v1/embeddings"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        out = post({"model": "mop-embed", "input": ["abc", "de"]})
        assert [d["index"] for d in out["data"]] == [0, 1]
        assert len(out["data"][0]["embedding"]) == 32
        assert out["usage"]["prompt_tokens"] == 5
        # token-id input matches the same strings' encoding
        ids = [[ord(c) % VOCAB for c in s] for s in ("abc", "de")]
        out2 = post({"model": "mop-embed", "input": ids})
        np.testing.assert_allclose(out["data"][1]["embedding"],
                                   out2["data"][1]["embedding"])
        # metrics counter
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/metrics", timeout=30) as r:
            text = r.read().decode()
        assert "mop_embeddings_served_total 4" in text
        # bad request -> OpenAI-shaped 400
        try:
            post({"model": "m", "input": []})
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()


def test_token_id_validation(setup):
    """Out-of-range and boolean token ids are rejected, not silently
    clamped by the gather (ADVICE r3)."""
    model, params = setup
    emb = EmbeddingModel(model, params)
    with pytest.raises(ValueError):
        emb.embed([[0, VOCAB]])          # == vocab_size: out of range
    with pytest.raises(ValueError):
        emb.embed([[-1]])
    with pytest.raises(ValueError):
        emb.embed([[True, 2]])           # bool is not a token id
    with pytest.raises(ValueError):
        parse_embedding_input({"input": [True, False]}, None)


def test_large_batch_chunks_match_solo(setup):
    """Batches above max_chunk run as bounded chunks and match the
    unchunked result row-for-row (ADVICE r3: no unbounded pow2 pad)."""
    model, params = setup
    emb = EmbeddingModel(model, params, max_chunk=4)
    seqs = [[(7 * i + j) % VOCAB for j in range(1 + i % 5)]
            for i in range(11)]
    out = emb.embed(seqs)
    assert out.shape == (11, 32)
    ref = EmbeddingModel(model, params).embed(seqs)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_gpt_mop_embeddings_match_flax_forward():
    """EmbeddingModel must apply the MoP gate (round-4: a GPT_MoP engine
    previously embedded through a gate-free forward). Oracle: the flax
    model's own ln_f output, captured via intermediates, mean-pooled."""
    from mop_tpu.models import create_gpt_mop_causal

    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=64, use_quartet=False)
    model = create_gpt_mop_causal(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 8), jnp.int32))
    seqs = [[5, 17, 3, 41, 2, 9, 8, 7]]  # length 8 = its own bucket
    emb = EmbeddingModel(model, params)
    got = emb.embed(seqs)
    _, mods = model.apply(params, jnp.asarray(seqs, jnp.int32),
                          capture_intermediates=True)
    h = mods["intermediates"]["ln_f"]["__call__"][0]  # (1, 8, 32)
    ref = np.asarray(h.mean(axis=1))
    ref = ref / np.maximum(np.linalg.norm(ref, axis=-1, keepdims=True),
                           1e-12)
    np.testing.assert_allclose(got, ref, atol=2e-5)
    # gate genuinely participates: zeroing the fuse alphas changes it
    import jax.tree_util as jtu
    p0 = jax.tree_util.tree_map(lambda x: x, params)
    flat = jtu.tree_flatten_with_path(p0)[0]
    zeroed = [np.zeros_like(leaf) if "alpha" in str(path) else leaf
              for path, leaf in flat]
    p0 = jtu.tree_unflatten(jtu.tree_structure(p0), zeroed)
    got0 = EmbeddingModel(model, p0).embed(seqs)
    assert not np.allclose(got, got0)


def test_gpt_mop_embeddings_pad_invariance():
    """Padding exactness holds for the MoP families too (pad rows are
    zeroed out of the gate conv taps)."""
    from mop_tpu.models import create_gpt_mop, create_gpt_mop_causal

    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=64, use_quartet=False)
    for maker in (create_gpt_mop_causal, create_gpt_mop):
        model = maker(VOCAB, cfg)
        params = model.init(jax.random.PRNGKey(5),
                            jnp.zeros((1, 8), jnp.int32))
        emb = EmbeddingModel(model, params)
        seq = [5, 17, 3, 41, 2]
        solo = emb.embed([seq])[0]
        batched = emb.embed([list(range(1, 30)), seq, [7, 7]])[1]
        np.testing.assert_allclose(solo, batched, atol=2e-5)
