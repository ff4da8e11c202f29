"""Gradient accumulation: accumulated microbatches == one full-batch step.

With augmentation off and dropout 0 the per-microbatch rng folding is inert,
so accum_steps=K must reproduce the plain step exactly up to fp32
reassociation (mean of equal-sized microbatch means == full-batch mean).
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from mop_tpu.models import TransformerConfig, ViT_MoP, create_gpt_quartet
from mop_tpu.ops.preprocess import CIFAR100_MEAN, CIFAR100_STD
from mop_tpu.parallel import (make_classifier_train_step, make_lm_train_step,
                              make_mesh, replicate, shard_batch)


def _l2(tree):
    return float(jnp.sqrt(sum(jnp.sum(jnp.square(v)) for v in
                              jax.tree_util.tree_leaves(tree)
                              if jnp.issubdtype(v.dtype, jnp.floating))))


def test_classifier_accum_matches_plain():
    mesh = make_mesh()
    model = ViT_MoP(dim=32, depth=1, heads=2, n_classes=10, n_views=2,
                    n_kernels=2, drop_path=0.0)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng},
                        np.zeros((2, 3, 32, 32), np.float32), train=True)
    tx = optax.adamw(1e-3)
    rs = np.random.RandomState(0)
    x = rs.randint(0, 256, (16, 3, 32, 32), dtype=np.uint8)
    y = rs.randint(0, 10, (16,)).astype(np.int32)

    outs = {}
    for a in (1, 4):
        step = make_classifier_train_step(
            model, tx, mesh, CIFAR100_MEAN, CIFAR100_STD, augment=False,
            compute_dtype=None, accum_steps=a)
        with mesh:
            p = replicate(jax.device_get(params), mesh)
            o = replicate(jax.device_get(tx.init(params)), mesh)
            xg, yg = shard_batch((x, y), mesh)
            for k in range(3):
                p, o, m = step(p, o, xg, yg, jax.random.fold_in(rng, k))
        outs[a] = (float(m["loss"]), float(m["acc"]), _l2(p))

    l1, a1, p1 = outs[1]
    l4, a4, p4 = outs[4]
    assert l4 == pytest.approx(l1, rel=2e-5)
    assert a4 == pytest.approx(a1, abs=1e-6)
    assert p4 == pytest.approx(p1, rel=2e-6)


def test_lm_accum_matches_plain():
    mesh = make_mesh()
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=16)
    model = create_gpt_quartet(40, cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 8), jnp.int32))
    tx = optax.adamw(1e-3)
    rs = np.random.RandomState(0)
    idx = rs.randint(0, 40, (8, 16)).astype(np.int32)
    tgt = rs.randint(0, 40, (8, 16)).astype(np.int32)

    outs = {}
    for a in (1, 2):
        step = make_lm_train_step(model, tx, mesh, compute_dtype=None,
                                  accum_steps=a)
        with mesh:
            p = replicate(jax.device_get(params), mesh)
            o = replicate(jax.device_get(tx.init(params)), mesh)
            ig, tg = shard_batch((idx, tgt), mesh)
            for k in range(3):
                p, o, m = step(p, o, ig, tg, jax.random.fold_in(rng, k))
        outs[a] = (float(m["loss"]), _l2(p))

    assert outs[2][0] == pytest.approx(outs[1][0], rel=2e-5)
    assert outs[2][1] == pytest.approx(outs[1][1], rel=2e-6)


def test_accum_indivisible_raises():
    mesh = make_mesh()
    model = ViT_MoP(dim=32, depth=1, heads=2, n_classes=10, n_views=2,
                    n_kernels=2)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng},
                        np.zeros((2, 3, 32, 32), np.float32), train=True)
    tx = optax.adamw(1e-3)
    step = make_classifier_train_step(
        model, tx, mesh, CIFAR100_MEAN, CIFAR100_STD, augment=False,
        compute_dtype=None, accum_steps=3)
    with mesh:
        p = replicate(params, mesh)
        o = replicate(tx.init(jax.device_get(params)), mesh)
        x = np.zeros((16, 3, 32, 32), np.uint8)
        y = np.zeros((16,), np.int32)
        xg, yg = shard_batch((x, y), mesh)
        with pytest.raises(ValueError, match="divisible"):
            step(p, o, xg, yg, rng)
