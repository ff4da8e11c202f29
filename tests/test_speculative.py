"""Speculative decoding (beyond-reference serving capability).

The contract under test: (1) `decode_chunk` over G tokens is exactly the
composition of G sequential `decode_step`s, and (2) greedy speculative
decoding emits the SAME tokens as the target-only cached sampler no matter
how bad the draft model is — the draft affects speed only.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

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


# ---------------- sampled (distribution-preserving) mode ----------------


def test_verify_sampled_marginal_equals_target_distribution():
    """The accept/resample construction must emit tokens distributed
    exactly as p, whatever q is: empirical check over 20k keys, gamma=1."""
    from mop_tpu.models.speculative import verify_sampled

    p = jnp.asarray([0.45, 0.25, 0.15, 0.10, 0.05])
    q = jnp.asarray([0.10, 0.50, 0.20, 0.10, 0.10])
    p_all = jnp.stack([p, p])  # bonus row unused when gamma=1 rejects

    def one(key):
        kd, kv = jax.random.split(key)
        d = jax.random.categorical(kd, jnp.log(q))[None].astype(jnp.int32)
        n_acc, corr = verify_sampled(kv, p_all, q[None], d)
        return jnp.where(n_acc >= 1, d[0], corr)

    keys = jax.random.split(jax.random.PRNGKey(0), 20000)
    toks = np.asarray(jax.vmap(one)(keys))
    emp = np.bincount(toks, minlength=5) / toks.size
    tv = 0.5 * np.abs(emp - np.asarray(p)).sum()
    assert tv < 0.02, (tv, emp)


def test_sampled_spec_identical_models_accept_everything():
    """p == q -> acceptance ratio 1 -> every draft accepted."""
    target, tparams = _model(2, seed=3)
    out, stats = speculative_generate(
        target, tparams, target, tparams, jnp.zeros((1, 4), jnp.int32),
        max_new_tokens=12, gamma=3, rng=jax.random.PRNGKey(5),
        temperature=0.9, return_stats=True)
    assert out.shape == (1, 16)
    assert int(stats["accepted"]) == int(stats["drafted"])


def test_sampled_spec_matches_target_marginal():
    """Empirical distribution of the 2nd generated token from the sampled
    speculative decoder matches target-only sampling (both must equal the
    target law; the draft is random and disagrees with the target)."""
    target, tparams = _model(2, n_embd=32, seed=1)
    draft, dparams = _model(1, n_embd=16, seed=7)
    prompt = jnp.asarray([[3, 1, 4, 1]], jnp.int32)
    n, temp = 400, 1.0

    spec = jax.jit(lambda k: speculative_generate(
        target, tparams, draft, dparams, prompt, max_new_tokens=2,
        gamma=1, rng=k, temperature=temp))
    base = jax.jit(lambda k: generate_cached(
        target, tparams, prompt, max_new_tokens=2, rng=k,
        temperature=temp))
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    toks_s = np.asarray([np.asarray(spec(k))[0, -1] for k in keys[: n // 2]])
    toks_b = np.asarray([np.asarray(base(k))[0, -1] for k in keys[n // 2:]])
    emp_s = np.bincount(toks_s, minlength=VOCAB) / toks_s.size
    emp_b = np.bincount(toks_b, minlength=VOCAB) / toks_b.size
    tv = 0.5 * np.abs(emp_s - emp_b).sum()
    assert tv < 0.25, tv


def test_sampled_spec_respects_top_k():
    target, tparams = _model(2, seed=3)
    draft, dparams = _model(1, n_embd=16, seed=9)
    prompt = jnp.zeros((1, 4), jnp.int32)
    out = speculative_generate(target, tparams, draft, dparams, prompt,
                               max_new_tokens=10, gamma=2,
                               rng=jax.random.PRNGKey(1), temperature=0.8,
                               top_k=5)
    assert out.shape == (1, 14)
    assert int(out.max()) < VOCAB and int(out.min()) >= 0
