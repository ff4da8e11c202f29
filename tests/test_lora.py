"""LoRA adapter fine-tuning: zero-effect init, adapter-only training,
merged-tree serving."""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mop_tpu.models import (TransformerConfig, ViT_MoP, create_gpt_quartet,
                            generate_cached)
from mop_tpu.training import (lora_init, lora_merge, lora_param_count,
                              make_lora_lm_train_step, make_lora_train_step)


def _gpt():
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=16, bias=False)
    model = create_gpt_quartet(40, cfg)
    idx = jax.random.randint(jax.random.PRNGKey(0), (4, 16), 0, 40)
    params = model.init(jax.random.PRNGKey(1), idx)
    return model, params, idx


def test_init_matches_only_2d_kernels_and_merge_is_identity():
    model, params, _ = _gpt()
    ad = lora_init(jax.random.PRNGKey(2), params, rank=4)
    # every adapted path is a kernel; embeddings/LN/scalars untouched
    assert ad and all(p.endswith("kernel") for p in ad)
    assert not any("wte" in p or "ln" in p or "mixture" in p for p in ad)
    merged = lora_merge(params, ad)
    for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(merged)[0]):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    # adapters are a small fraction of the base model
    base_n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert lora_param_count(ad) < 0.3 * base_n


def test_lm_training_moves_only_adapters_and_reduces_loss():
    model, params, idx = _gpt()
    ad = lora_init(jax.random.PRNGKey(2), params, rank=4)
    opt = optax.adamw(1e-2)
    step = make_lora_lm_train_step(model, params, opt)
    ost = opt.init(ad)
    base_snapshot = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                           params)
    tgt = jnp.roll(idx, -1, axis=1)
    losses = []
    for _ in range(25):
        ad, ost, loss = step(ad, ost, idx, tgt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1, losses[:3] + losses[-3:]
    # the base tree is untouched
    for (_, va), (_, vb) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(base_snapshot)[0]):
        np.testing.assert_array_equal(np.asarray(va), vb)
    # ...and the merged tree actually changed
    merged = lora_merge(params, ad)
    l0, _ = model.apply(params, idx, targets=tgt, train=False)
    l1, _ = model.apply(merged, idx, targets=tgt, train=False)
    assert not np.allclose(np.asarray(l0), np.asarray(l1))


def test_merged_tree_serves_through_generate_cached():
    model, params, idx = _gpt()
    ad = lora_init(jax.random.PRNGKey(2), params, rank=2)
    # perturb b so the merge is non-trivial
    ad = jax.tree_util.tree_map(lambda x: x + 0.01, ad)
    merged = lora_merge(params, ad)
    out = generate_cached(model, merged, idx[:2, :4], max_new_tokens=6)
    assert out.shape == (2, 10)
    base = generate_cached(model, params, idx[:2, :4], max_new_tokens=6)
    assert out.shape == base.shape  # both run; trees are independent


def test_custom_match_restricts_targets():
    model, params, _ = _gpt()
    ad = lora_init(jax.random.PRNGKey(2), params, rank=4,
                   match=lambda p, leaf: "attn" in p and p.endswith("kernel"))
    assert ad and all("attn" in p for p in ad)
    with pytest.raises(ValueError, match="matched no kernels"):
        lora_init(jax.random.PRNGKey(2), params, rank=4,
                  match=lambda p, leaf: False)
    with pytest.raises(ValueError, match="rank"):
        lora_init(jax.random.PRNGKey(2), params, rank=0)


def test_generic_step_works_for_vit_classifier():
    model = ViT_MoP(img_size=16, patch=4, n_classes=5, dim=32,
                    depth=2, heads=2, drop_path=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 16, 16))
    y = jnp.asarray([0, 1, 2, 3])
    params = model.init(jax.random.PRNGKey(1), x)
    ad = lora_init(jax.random.PRNGKey(2), params, rank=4)

    def loss_of_params(p, xb, yb):
        logits = model.apply(p, xb, train=False)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, yb).mean()

    opt = optax.adamw(1e-2)
    step = make_lora_train_step(loss_of_params, params, opt)
    ost = opt.init(ad)
    losses = []
    for _ in range(20):
        ad, ost, loss = step(ad, ost, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1, losses[:3] + losses[-3:]
