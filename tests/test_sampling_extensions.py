"""min-p sampling and repetition/presence/frequency penalties.

Beyond-reference decode features (the reference has no generation loop at
all, SURVEY §0); semantics follow the vLLM conventions — repetition penalty
over prompt+output tokens, presence/frequency over output tokens only,
min-p relative to the per-step max probability.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_baseline, \
    create_gpt_quartet
from mop_tpu.models.generate import (_apply_penalties, _min_p_mask,
                                     generate, generate_cached)


def _setup(vocab=40, block=16, quartet=True):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=block, bias=False)
    make = create_gpt_quartet if quartet else create_gpt_baseline
    model = make(vocab, cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(0), (2, 4), 0, vocab)
    params = model.init(jax.random.PRNGKey(1), prompt)
    return model, params, prompt


# ------------------------------ unit semantics ------------------------------

def test_min_p_mask_keeps_exactly_above_threshold():
    logits = jnp.log(jnp.asarray([[0.5, 0.25, 0.2, 0.05]]))
    kept = np.asarray(_min_p_mask(logits, 0.45)) > -np.inf
    np.testing.assert_array_equal(kept, [[True, True, False, False]])
    # min_p relative to max prob: 0.25/0.5 = 0.5 >= 0.45 kept; 0.2/0.5 < 0.45
    kept_all = np.asarray(_min_p_mask(logits, 0.05)) > -np.inf
    assert kept_all.all()


def test_apply_penalties_semantics():
    logits = jnp.asarray([[2.0, -1.0, 0.5, 3.0]])
    out_counts = jnp.asarray([[2, 1, 0, 0]], jnp.int32)
    seen = jnp.asarray([[True, True, False, True]])  # token 3 = prompt-only

    # repetition: seen positives divided, seen negatives multiplied
    rep = np.asarray(_apply_penalties(logits, out_counts, seen, 2.0,
                                      None, None))
    np.testing.assert_allclose(rep, [[1.0, -2.0, 0.5, 1.5]])

    # presence: flat subtraction where out_count > 0 (prompt-only untouched)
    pres = np.asarray(_apply_penalties(logits, out_counts, seen, None,
                                       0.5, None))
    np.testing.assert_allclose(pres, [[1.5, -1.5, 0.5, 3.0]])

    # frequency: proportional to output count
    freq = np.asarray(_apply_penalties(logits, out_counts, seen, None,
                                       None, 0.25))
    np.testing.assert_allclose(freq, [[1.5, -1.25, 0.5, 3.0]])


# ------------------------------ end-to-end ---------------------------------

def test_min_p_one_equals_greedy_cached_and_full_window():
    """min_p=1.0 keeps only the argmax token, so high-temperature sampling
    collapses to greedy for both samplers."""
    model, params, prompt = _setup()
    ref = generate(model, params, prompt, max_new_tokens=8)
    out = generate(model, params, prompt, max_new_tokens=8,
                   rng=jax.random.PRNGKey(3), temperature=3.0, min_p=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    ref_c = generate_cached(model, params, prompt, max_new_tokens=8)
    out_c = generate_cached(model, params, prompt, max_new_tokens=8,
                            rng=jax.random.PRNGKey(3), temperature=3.0,
                            min_p=1.0)
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(ref_c))


def test_large_presence_penalty_forbids_output_repeats():
    """presence_penalty >> logit scale makes every emitted token distinct
    (vocab 40 > 10 steps), in both the full-window and cached samplers and
    under greedy decoding (penalties apply there too)."""
    model, params, prompt = _setup()
    for fn in (generate, generate_cached):
        out = np.asarray(fn(model, params, prompt, max_new_tokens=10,
                            presence_penalty=1e4))
        gen = out[:, prompt.shape[1]:]
        for row in gen:
            assert len(set(row.tolist())) == len(row), row


def test_large_repetition_penalty_also_penalizes_prompt_tokens():
    """With a huge additive-free repetition penalty the argmax can still be
    a seen token, so instead check the effective ordering: tokens seen in
    the PROMPT are penalized by repetition but not by presence."""
    model, params, prompt = _setup()
    logits, _ = model.apply(params, jnp.pad(prompt, ((0, 0), (0, 12))),
                            train=False)
    last = logits[:, prompt.shape[1] - 1]
    pc = jnp.zeros((2, 40), jnp.int32).at[
        jnp.arange(2)[:, None], prompt].add(1)
    seen = pc > 0
    pen = _apply_penalties(last, jnp.zeros_like(pc), seen, 1.5, None, None)
    d = np.asarray(last - pen)
    seen_np = np.asarray(seen)
    assert (np.abs(d[~seen_np]) < 1e-6).all()  # unseen rows untouched
    assert (np.abs(d[seen_np]) > 0).any()      # seen tokens moved


def test_penalties_grow_window_matches_plain():
    """The grow-window path threads the count buffers through its jitted
    segments; on CPU it is bit-exact vs the single-scan path, penalties
    included."""
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=256, bias=False)
    model = create_gpt_quartet(40, cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(0), (2, 5), 0, 40)
    params = model.init(jax.random.PRNGKey(1), prompt)
    kw = dict(max_new_tokens=90, rng=jax.random.PRNGKey(7),
              temperature=0.9, top_k=12, min_p=0.02,
              repetition_penalty=1.3, presence_penalty=0.4,
              frequency_penalty=0.2)
    a = generate_cached(model, params, prompt, grow_window=False, **kw)
    b = generate_cached(model, params, prompt, grow_window=True, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_all_knobs_sampled_output_is_valid():
    model, params, prompt = _setup(quartet=False)
    out = generate_cached(model, params, prompt, max_new_tokens=6,
                          rng=jax.random.PRNGKey(11), temperature=1.1,
                          top_k=20, top_p=0.9, min_p=0.01,
                          repetition_penalty=1.2, presence_penalty=0.1,
                          frequency_penalty=0.1)
    assert out.shape == (2, 10)
    assert bool(jnp.all((out >= 0) & (out < 40)))
    # deterministic given the same rng
    out2 = generate_cached(model, params, prompt, max_new_tokens=6,
                           rng=jax.random.PRNGKey(11), temperature=1.1,
                           top_k=20, top_p=0.9, min_p=0.01,
                           repetition_penalty=1.2, presence_penalty=0.1,
                           frequency_penalty=0.1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
