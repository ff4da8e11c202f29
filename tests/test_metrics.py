"""Evaluation metrics: perplexity, WER/CER, top-k accuracy."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_baseline
from mop_tpu.utils import cer, lm_nll, lm_perplexity, topk_accuracy, wer
from mop_tpu.utils.metrics import _edit_distance


def _gpt(vocab=30):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=16, bias=False)
    model = create_gpt_baseline(vocab, cfg)
    idx = jax.random.randint(jax.random.PRNGKey(0), (6, 16), 0, vocab)
    params = model.init(jax.random.PRNGKey(1), idx)
    return model, params, idx


def test_lm_nll_matches_model_loss():
    """The model's own CE loss IS the mean next-token NLL — the two paths
    must agree."""
    model, params, idx = _gpt()
    nll = float(lm_nll(model, params, idx))
    _, loss = model.apply(params, idx[:, :-1], targets=idx[:, 1:],
                          train=False)
    np.testing.assert_allclose(nll, float(loss), rtol=1e-5)


def test_perplexity_is_exp_nll_and_batch_invariant():
    model, params, idx = _gpt()
    ppl_a, nll_a = lm_perplexity(model, params, idx, batch_size=6)
    ppl_b, nll_b = lm_perplexity(model, params, idx, batch_size=4)  # 6=4+2
    np.testing.assert_allclose(ppl_a, math.exp(nll_a), rtol=1e-6)
    np.testing.assert_allclose(nll_a, nll_b, rtol=1e-5)  # padded tail exact


def test_perplexity_mask_matches_manual_weighted_mean():
    """Masked perplexity == the token-weighted mean NLL computed by hand
    from the model's logits. (An input-invariance formulation would be
    wrong here: this family standardizes score rows over ALL columns
    before the causal mask, so even masked positions' inputs perturb
    earlier logits — the very property documented in generate.py.)"""
    model, params, idx = _gpt()
    mask = jnp.ones(idx.shape).at[:, 10:].set(0.0).at[2].set(0.0)
    _, got = lm_perplexity(model, params, idx, mask=mask, batch_size=4)
    logits, _ = model.apply(params, idx[:, :-1], train=False)
    logp = np.asarray(jax.nn.log_softmax(logits, -1))
    tgt = np.asarray(idx[:, 1:])
    nll = -np.take_along_axis(logp, tgt[..., None], -1)[..., 0]
    m = np.asarray(mask)[:, 1:]
    want = (nll * m).sum() / m.sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_edit_distance_known_cases():
    assert _edit_distance("kitten", "sitting") == 3
    assert _edit_distance("", "abc") == 3
    assert _edit_distance("abc", "") == 3
    assert _edit_distance([1, 2, 3], [1, 2, 3]) == 0


def test_wer_and_cer():
    assert wer("a b c", "a x c") == pytest.approx(1 / 3)
    assert wer("a b c", "a b") == pytest.approx(1 / 3)        # deletion
    assert wer("a b", "a x b y") == pytest.approx(1.0)        # 2 ins / 2 ref
    assert wer([[1, 2, 3], [4, 5]], [[1, 2], [4, 5]]) == pytest.approx(0.2)
    assert cer("abc", "abc") == 0.0
    assert cer("abc", "axc") == pytest.approx(1 / 3)
    with pytest.raises(ValueError):
        wer("", "x")


def test_topk_accuracy():
    logits = jnp.asarray([[0.1, 0.9, 0.0],
                          [0.8, 0.1, 0.1],
                          [0.2, 0.3, 0.5]])
    labels = jnp.asarray([1, 2, 1])
    assert float(topk_accuracy(logits, labels, 1)) == pytest.approx(1 / 3)
    # row 1's 0.1-tie breaks to the LOWER index (lax.top_k), so label 2 is
    # still out at k=2; row 2's label 1 enters at k=2
    assert float(topk_accuracy(logits, labels, 2)) == pytest.approx(2 / 3)
    assert float(topk_accuracy(logits, labels, 3)) == pytest.approx(1.0)
