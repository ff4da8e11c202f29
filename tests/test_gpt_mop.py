"""GPT-MoP / Quartet contract (reference ``tests/test_gpt_mop.py``)."""

import jax
import jax.numpy as jnp
import numpy as np

from mop_tpu.models import (
    ComparisonConfig,
    create_comparison_framework,
    create_gpt_baseline,
    create_gpt_mop,
    create_gpt_quartet,
)
from mop_tpu.models.quartet_attn_patch import TransformerConfig


def _count(tree):
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


def test_individual_models():
    config = TransformerConfig(
        n_layer=2, n_head=2, n_embd=64, block_size=32, dropout=0.1, bias=False
    )
    vocab_size = 200
    x = jnp.zeros((1, 8), jnp.int32)
    rng = jax.random.PRNGKey(0)
    for m in [
        create_gpt_baseline(vocab_size, config),
        create_gpt_quartet(vocab_size, config),
        create_gpt_mop(vocab_size, config, n_views=2, n_kernels=1),
    ]:
        assert _count(m.init(rng, x)) > 0


def test_forward_pass():
    config = TransformerConfig(
        n_layer=2, n_head=2, n_embd=64, block_size=32, dropout=0.1, bias=False
    )
    vocab_size = 100
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (2, 16), 0, vocab_size)
    y = jax.random.randint(jax.random.fold_in(rng, 1), (2, 16), 0, vocab_size)

    for m in [
        create_gpt_baseline(vocab_size, config),
        create_gpt_quartet(vocab_size, config),
        create_gpt_mop(vocab_size, config, n_views=2, n_kernels=1),
    ]:
        params = m.init(rng, x)
        logits, loss = m.apply(params, x, targets=y)
        assert logits.shape[:2] == (2, 16)
        assert loss is not None and bool(jnp.isfinite(loss))


def test_comparison_framework():
    cfg = ComparisonConfig(n_layer=2, n_head=2, n_embd=64, block_size=32)
    fw = create_comparison_framework(cfg)
    models = fw.build_models(vocab_size=300)
    assert set(models.keys()) == {"baseline", "quartet", "mop"}
    analysis = fw.parameter_matching_analysis()
    assert "quartet" in analysis["comparisons"]


def test_gpt_mop_gate_maps():
    config = TransformerConfig(n_layer=2, n_head=2, n_embd=64, block_size=32, dropout=0.0)
    m = create_gpt_mop(100, config, n_views=2, n_kernels=1)
    x = jnp.zeros((2, 16), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x)
    gates, views, kernels = m.apply(params, x, method=m.get_gate_maps)
    assert gates.shape == (2, 2, 1, 16)
    assert views.shape == (2, 2, 2, 16)
    assert kernels.shape == (2, 2, 1, 16)
