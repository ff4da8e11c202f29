"""Tensor-parallel sharding: dp x tp training equals replicated training.

GSPMD is semantics-preserving, so a step with column/row-parallel weight
shardings over the mesh 'model' axis must produce the same fp32 numerics as
the replicated data-parallel step — up to reduction order. These tests run on
the 8-virtual-CPU-device mesh from conftest.py.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mop_tpu.models import ViT_MoP, TransformerConfig, create_gpt_mop
from mop_tpu.ops.preprocess import CIFAR100_MEAN, CIFAR100_STD
from mop_tpu.parallel import make_mesh, replicate, shard_batch
from mop_tpu.parallel.mesh import MODEL_AXIS
from mop_tpu.parallel.tp import (
    make_tp_classifier_train_step,
    make_tp_lm_train_step,
    tp_init_opt_state,
    tp_param_shardings,
    tp_shard_params,
)
from mop_tpu.parallel.train_step import make_classifier_train_step


requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _vit_setup(batch=16):
    model = ViT_MoP(dim=64, depth=2, heads=4, n_classes=10, n_views=3,
                    n_kernels=2, drop_path=0.0)
    rng = jax.random.PRNGKey(0)
    x = np.random.RandomState(0).randint(0, 256, (batch, 3, 32, 32),
                                         dtype=np.uint8)
    y = np.random.RandomState(1).randint(0, 10, (batch,)).astype(np.int32)
    params = model.init({"params": rng, "dropout": rng},
                        jnp.zeros((batch, 3, 32, 32)), train=True)
    # Host copies: the train steps donate their inputs, and device_put of an
    # already-placed array may alias the same buffer across both runs.
    params = jax.tree_util.tree_map(np.asarray, params)
    tx = optax.adamw(1e-3)
    return model, params, tx, x, y, rng


@requires_8
def test_tp_params_actually_sharded():
    model, params, tx, x, y, rng = _vit_setup()
    mesh = make_mesh(n_devices=8, model_parallel=2)
    sh = tp_param_shardings(params, mesh)
    flat = dict(jax.tree_util.tree_flatten_with_path(sh)[0])
    qkv = [v for k, v in flat.items()
           if any(getattr(p, "key", "") == "qkv" for p in k)]
    proj = [v for k, v in flat.items()
            if any(getattr(p, "key", "") == "proj" for p in k)]
    assert qkv and all(s.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)
                       for s in qkv)
    # MSA 'proj' is row-parallel; PatchEmbed's 'proj' is a conv kernel that
    # the divisibility guard may replicate — check at least one row split.
    assert any(s.spec == jax.sharding.PartitionSpec(MODEL_AXIS, None)
               for s in proj)
    # Physical shard shapes really are split.
    sharded = tp_shard_params(params, mesh)
    k = sharded["params"]["enc"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert k.addressable_shards[0].data.shape[1] == k.shape[1] // 2


@requires_8
@pytest.mark.parametrize("tp", [2, 4])
def test_tp_training_matches_replicated_fp32(tp):
    model, params, tx, x, y, rng = _vit_setup()

    # Reference: replicated data-parallel on the 8-device mesh, fp32.
    mesh_dp = make_mesh(n_devices=8)
    p_dp = replicate(params, mesh_dp)
    o_dp = replicate(tx.init(params), mesh_dp)
    xb, yb = shard_batch((x, y), mesh_dp)
    with mesh_dp:
        step_dp = make_classifier_train_step(
            model, tx, mesh_dp, CIFAR100_MEAN, CIFAR100_STD,
            augment=False, compute_dtype=None)
        for i in range(3):
            p_dp, o_dp, m_dp = step_dp(p_dp, o_dp, xb, yb,
                                       jax.random.fold_in(rng, i))

    # dp x tp with TP weight shardings, fp32.
    mesh_tp = make_mesh(n_devices=8, model_parallel=tp)
    with mesh_tp:
        p_tp = tp_shard_params(params, mesh_tp)
        o_tp = tp_init_opt_state(tx, p_tp)
        xb2, yb2 = shard_batch((x, y), mesh_tp)
        step_tp = make_tp_classifier_train_step(
            model, tx, mesh_tp, CIFAR100_MEAN, CIFAR100_STD,
            augment=False, compute_dtype=None)
        for i in range(3):
            p_tp, o_tp, m_tp = step_tp(p_tp, o_tp, xb2, yb2,
                                       jax.random.fold_in(rng, i))

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_dp["loss"]),
                               rtol=1e-5)
    flat_dp = jax.tree_util.tree_leaves(p_dp)
    flat_tp = jax.tree_util.tree_leaves(p_tp)
    # AdamW divides by sqrt(v): tiny reduction-order grad diffs amplify in
    # early steps, so parameters agree to ~1e-3 relative after 3 updates.
    for a, b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-6)


@requires_8
@pytest.mark.parametrize("sp", [False, True])
def test_tp_gpt_training_matches_replicated_fp32(sp):
    cfg = TransformerConfig(n_layer=2, n_head=4, n_embd=64, dropout=0.0,
                            block_size=16)
    model = create_gpt_mop(vocab_size=64, config=cfg, n_views=3, n_kernels=2)
    rng = jax.random.PRNGKey(0)
    idx = np.random.RandomState(0).randint(0, 64, (16, 16)).astype(np.int32)
    tgt = np.roll(idx, -1, axis=-1).astype(np.int32)
    params = jax.tree_util.tree_map(
        np.asarray, model.init(rng, jnp.asarray(idx)))
    tx = optax.adamw(1e-3)

    def run(tp, sp_flag=False):
        mesh = make_mesh(n_devices=8, model_parallel=tp)
        with mesh:
            p = tp_shard_params(params, mesh) if tp > 1 else replicate(
                params, mesh)
            o = tp_init_opt_state(tx, p)
            ib, tb = shard_batch((idx, tgt), mesh)
            step = make_tp_lm_train_step(model, tx, mesh, compute_dtype=None,
                                         sequence_parallel=sp_flag)
            for i in range(3):
                p, o, m = step(p, o, ib, tb, jax.random.fold_in(rng, i))
        return float(m["loss"]), p

    loss_dp, p_dp = run(1)
    loss_tp, p_tp = run(2, sp)
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=1e-5)
    # atol 5e-4 = half an Adam step of lr=1e-3: near-zero weights whose tiny
    # gradients flip sign under a different reduction order move that much.
    for a, b in zip(jax.tree_util.tree_leaves(p_dp),
                    jax.tree_util.tree_leaves(p_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4)
