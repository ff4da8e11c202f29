"""Speculative decoding (beyond-reference serving capability).

The contract under test: (1) `decode_chunk` over G tokens is exactly the
composition of G sequential `decode_step`s, and (2) greedy speculative
decoding emits the SAME tokens as the target-only cached sampler no matter
how bad the draft model is — the draft affects speed only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_quartet
from mop_tpu.models.generate import (decode_chunk, decode_step,
                                     generate_cached, prefill)
from mop_tpu.models.speculative import speculative_generate

VOCAB = 40


def _model(n_layer, n_embd=32, use_quartet=True, seed=1, block_size=64):
    cfg = TransformerConfig(n_layer=n_layer, n_head=2, n_embd=n_embd,
                            dropout=0.0, block_size=block_size, bias=False,
                            use_quartet=use_quartet)
    model = create_gpt_quartet(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 4), jnp.int32))
    return model, params


@pytest.mark.parametrize("use_quartet", [True, False])
def test_decode_chunk_equals_sequential_decode_steps(use_quartet):
    model, params = _model(2, use_quartet=use_quartet)
    prompt = jax.random.randint(jax.random.PRNGKey(0), (2, 5), 0, VOCAB)
    _, cache = prefill(model, params, prompt)
    toks = jax.random.randint(jax.random.PRNGKey(2), (2, 4), 0, VOCAB)

    # sequential
    seq_cache = cache
    seq_logits = []
    for i in range(4):
        lg, seq_cache = decode_step(model, params, seq_cache, toks[:, i])
        seq_logits.append(lg)
    seq_logits = jnp.stack(seq_logits, axis=1)  # (B, 4, V)

    chunk_logits, chunk_cache = decode_chunk(model, params, cache, toks)

    np.testing.assert_allclose(np.asarray(chunk_logits),
                               np.asarray(seq_logits), rtol=1e-5, atol=1e-5)
    assert int(chunk_cache["len"]) == int(seq_cache["len"])
    for k in ("k", "k2", "v"):
        np.testing.assert_allclose(np.asarray(chunk_cache[k]),
                                   np.asarray(seq_cache[k]),
                                   rtol=1e-5, atol=1e-6)


def test_speculative_equals_target_only_greedy():
    """Exactness: a 1-layer random draft cannot change the 3-layer target's
    greedy output, only how many rounds it takes."""
    target, tparams = _model(3, n_embd=32, seed=1)
    draft, dparams = _model(1, n_embd=16, seed=7)
    prompt = jax.random.randint(jax.random.PRNGKey(0), (1, 6), 0, VOCAB)

    ref = generate_cached(target, tparams, prompt, max_new_tokens=17)
    for gamma in (1, 3, 5):
        out, stats = speculative_generate(
            target, tparams, draft, dparams, prompt,
            max_new_tokens=17, gamma=gamma, return_stats=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        assert int(stats["rounds"]) >= 1
        assert 0 <= int(stats["accepted"]) <= int(stats["drafted"])


def test_speculative_with_perfect_draft_accepts_everything():
    """draft == target -> every draft token matches, so each round emits
    gamma+1 tokens and acceptance is 100%."""
    target, tparams = _model(2, seed=3)
    prompt = jnp.zeros((1, 4), jnp.int32)
    max_new, gamma = 12, 3
    out, stats = speculative_generate(
        target, tparams, target, tparams, prompt,
        max_new_tokens=max_new, gamma=gamma, return_stats=True)
    ref = generate_cached(target, tparams, prompt, max_new_tokens=max_new)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert int(stats["accepted"]) == int(stats["drafted"])
    # ceil(max_new / (gamma+1)) rounds when everything is accepted
    assert int(stats["rounds"]) == -(-max_new // (gamma + 1))


def test_speculative_validates_inputs():
    target, tparams = _model(1)
    draft, dparams = _model(1, seed=9)
    with pytest.raises(ValueError, match="batch 1"):
        speculative_generate(target, tparams, draft, dparams,
                             jnp.zeros((2, 4), jnp.int32), 4)
    with pytest.raises(ValueError, match="block_size"):
        speculative_generate(target, tparams, draft, dparams,
                             jnp.zeros((1, 4), jnp.int32), 60, gamma=4)
    with pytest.raises(ValueError, match="gamma"):
        speculative_generate(target, tparams, draft, dparams,
                             jnp.zeros((1, 4), jnp.int32), 4, gamma=0)
