"""Window-doubling cached decode == fixed-window cached decode, bit-exact.

Columns beyond the live prefix are masked out of every standardization and
softmax, so restricting the cache to a power-of-two window >= the live
length is the identical computation — the grow_window path must reproduce
the plain cached sampler token-for-token across window doublings, greedy
and sampled, fp32 and bf16 KV.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mop_tpu.models import TransformerConfig, create_gpt_baseline, \
    create_gpt_quartet, generate_cached


def _setup(use_quartet=True, block=256, vocab=64):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=block)
    mk = create_gpt_quartet if use_quartet else create_gpt_baseline
    model = mk(vocab, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


@pytest.mark.parametrize("use_quartet", [True, False])
@pytest.mark.parametrize("t0,new", [(5, 200), (60, 100), (100, 20)])
def test_grow_window_bit_exact_greedy(use_quartet, t0, new):
    model, params = _setup(use_quartet)
    prompt = jax.random.randint(jax.random.PRNGKey(0), (2, t0), 0, 64)
    base = generate_cached(model, params, prompt, max_new_tokens=new)
    grow = generate_cached(model, params, prompt, max_new_tokens=new,
                           grow_window=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(grow))


def test_grow_window_bit_exact_sampled():
    model, params = _setup()
    prompt = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 0, 64)
    kw = dict(max_new_tokens=150, rng=jax.random.PRNGKey(9),
              temperature=0.8, top_k=20, top_p=0.95)
    base = generate_cached(model, params, prompt, **kw)
    grow = generate_cached(model, params, prompt, grow_window=True, **kw)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(grow))


def test_grow_window_bf16_kv():
    model, params = _setup()
    prompt = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 0, 64)
    base = generate_cached(model, params, prompt, max_new_tokens=150,
                           kv_dtype=jnp.bfloat16)
    grow = generate_cached(model, params, prompt, max_new_tokens=150,
                           kv_dtype=jnp.bfloat16, grow_window=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(grow))


def test_grow_window_single_token():
    model, params = _setup()
    prompt = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 0, 64)
    base = generate_cached(model, params, prompt, max_new_tokens=1)
    grow = generate_cached(model, params, prompt, max_new_tokens=1,
                           grow_window=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(grow))
