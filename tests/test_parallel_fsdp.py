"""FSDP / ZeRO sharding: fully-sharded training equals replicated training.

Parameters, gradients, and AdamW moments are sharded over the SAME mesh axis
as the batch; GSPMD inserts the weight all-gathers and gradient
reduce-scatters. Semantics must match the replicated data-parallel step in
fp32 up to reduction order. Runs on the 8-virtual-CPU-device mesh from
conftest.py.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from mop_tpu.models import TransformerConfig, ViT_MoP, create_gpt_mop
from mop_tpu.ops.preprocess import CIFAR100_MEAN, CIFAR100_STD
from mop_tpu.parallel import make_mesh, replicate, shard_batch
from mop_tpu.parallel.fsdp import (
    fsdp_init_opt_state,
    fsdp_param_shardings,
    fsdp_shard_params,
    fsdp_spec,
    make_fsdp_classifier_train_step,
    make_fsdp_lm_train_step,
    zero1_init_opt_state,
)
from mop_tpu.parallel.mesh import DATA_AXIS
from mop_tpu.parallel.train_step import (
    make_classifier_train_step,
    make_lm_train_step,
)

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_fsdp_spec_picks_largest_dividing_dim():
    assert fsdp_spec((512, 64), 8, min_size=1) == P(DATA_AXIS, None)
    assert fsdp_spec((64, 512), 8, min_size=1) == P(None, DATA_AXIS)
    # Largest dim (100) does not divide by 8 -> falls through to 64.
    assert fsdp_spec((100, 64), 8, min_size=1) == P(None, DATA_AXIS)
    # Nothing divides -> replicated.
    assert fsdp_spec((7, 9), 8, min_size=1) == P()
    # Below min_size -> replicated even when divisible.
    assert fsdp_spec((64,), 8, min_size=2**12) == P()
    assert fsdp_spec((), 8) == P()


def _vit_setup(batch=16):
    model = ViT_MoP(dim=64, depth=2, heads=4, n_classes=10, n_views=3,
                    n_kernels=2, drop_path=0.0)
    rng = jax.random.PRNGKey(0)
    x = np.random.RandomState(0).randint(0, 256, (batch, 3, 32, 32),
                                         dtype=np.uint8)
    y = np.random.RandomState(1).randint(0, 10, (batch,)).astype(np.int32)
    params = model.init({"params": rng, "dropout": rng},
                        jnp.zeros((batch, 3, 32, 32)), train=True)
    # Host copies: the train steps donate their inputs.
    params = jax.tree_util.tree_map(np.asarray, params)
    tx = optax.adamw(1e-3)
    return model, params, tx, x, y, rng


@requires_8
def test_fsdp_params_and_moments_actually_sharded():
    model, params, tx, x, y, rng = _vit_setup()
    mesh = make_mesh(n_devices=8)
    min_size = 256  # shard even the tiny test model's weights
    with mesh:
        p = fsdp_shard_params(params, mesh, min_size=min_size)
        o = fsdp_init_opt_state(tx, params, mesh, min_size=min_size)
    k = p["params"]["enc"]["blocks_0"]["attn"]["qkv"]["kernel"]
    # (64, 192): largest dividing dim (192 % 8 == 0) is split 8 ways.
    assert k.addressable_shards[0].data.shape[1] == k.shape[1] // 8
    # Adam moments inherit the parameter shardings (ZeRO optimizer state).
    mu = o[0].mu["params"]["enc"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert mu.addressable_shards[0].data.shape[1] == mu.shape[1] // 8
    # Small leaves (LayerNorm scales) stay replicated.
    ln = p["params"]["enc"]["blocks_0"]["ln1"]["scale"]
    assert ln.addressable_shards[0].data.shape == ln.shape


@requires_8
@pytest.mark.parametrize("shard_params", [True, False],
                         ids=["fsdp", "zero1"])
def test_fsdp_training_matches_replicated_fp32(shard_params):
    model, params, tx, x, y, rng = _vit_setup()
    min_size = 256

    # Reference: replicated data-parallel on the 8-device mesh, fp32.
    mesh = make_mesh(n_devices=8)
    with mesh:
        p_dp = replicate(params, mesh)
        o_dp = replicate(tx.init(params), mesh)
        xb, yb = shard_batch((x, y), mesh)
        step_dp = make_classifier_train_step(
            model, tx, mesh, CIFAR100_MEAN, CIFAR100_STD,
            augment=False, compute_dtype=None)
        for i in range(3):
            p_dp, o_dp, m_dp = step_dp(p_dp, o_dp, xb, yb,
                                       jax.random.fold_in(rng, i))

    mesh2 = make_mesh(n_devices=8)
    with mesh2:
        if shard_params:
            p_f = fsdp_shard_params(params, mesh2, min_size=min_size)
            o_f = fsdp_init_opt_state(tx, params, mesh2, min_size=min_size)
        else:
            p_f = replicate(params, mesh2)
            o_f = zero1_init_opt_state(tx, params, mesh2, min_size=min_size)
        xb2, yb2 = shard_batch((x, y), mesh2)
        step_f = make_fsdp_classifier_train_step(
            model, tx, mesh2, CIFAR100_MEAN, CIFAR100_STD,
            augment=False, compute_dtype=None, min_size=min_size,
            shard_params=shard_params)
        for i in range(3):
            p_f, o_f, m_f = step_f(p_f, o_f, xb2, yb2,
                                   jax.random.fold_in(rng, i))
        if shard_params:
            k = p_f["params"]["enc"]["blocks_0"]["attn"]["qkv"]["kernel"]
            assert k.addressable_shards[0].data.shape[1] == k.shape[1] // 8, \
                "params lost their FSDP sharding across steps"
        else:
            mu = o_f[0].mu["params"]["enc"]["blocks_0"]["attn"]["qkv"]["kernel"]
            assert mu.addressable_shards[0].data.shape[1] == mu.shape[1] // 8, \
                "ZeRO-1 moments lost their sharding across steps"

    np.testing.assert_allclose(float(m_f["loss"]), float(m_dp["loss"]),
                               rtol=1e-5)
    # AdamW divides by sqrt(v): tiny reduction-order grad diffs amplify in
    # early steps, so parameters agree to ~1e-3 relative after 3 updates.
    for a, b in zip(jax.tree_util.tree_leaves(p_dp),
                    jax.tree_util.tree_leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-6)


@requires_8
def test_fsdp_gpt_training_matches_replicated_fp32():
    cfg = TransformerConfig(n_layer=2, n_head=4, n_embd=64, dropout=0.0,
                            block_size=16)
    model = create_gpt_mop(vocab_size=64, config=cfg, n_views=3, n_kernels=2)
    rng = jax.random.PRNGKey(0)
    idx = np.random.RandomState(0).randint(0, 64, (16, 16)).astype(np.int32)
    tgt = np.roll(idx, -1, axis=-1).astype(np.int32)
    params = jax.tree_util.tree_map(
        np.asarray, model.init(rng, jnp.asarray(idx)))
    tx = optax.adamw(1e-3)
    min_size = 256

    mesh = make_mesh(n_devices=8)
    with mesh:
        p_dp = replicate(params, mesh)
        o_dp = replicate(tx.init(params), mesh)
        ib, tb = shard_batch((idx, tgt), mesh)
        step_dp = make_lm_train_step(model, tx, mesh, compute_dtype=None)
        for i in range(3):
            p_dp, o_dp, m_dp = step_dp(p_dp, o_dp, ib, tb,
                                       jax.random.fold_in(rng, i))

    mesh2 = make_mesh(n_devices=8)
    with mesh2:
        p_f = fsdp_shard_params(params, mesh2, min_size=min_size)
        o_f = fsdp_init_opt_state(tx, params, mesh2, min_size=min_size)
        ib2, tb2 = shard_batch((idx, tgt), mesh2)
        step_f = make_fsdp_lm_train_step(
            model, tx, mesh2, compute_dtype=None, min_size=min_size)
        for i in range(3):
            p_f, o_f, m_f = step_f(p_f, o_f, ib2, tb2,
                                   jax.random.fold_in(rng, i))

    np.testing.assert_allclose(float(m_f["loss"]), float(m_dp["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_dp),
                    jax.tree_util.tree_leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4)


@requires_8
def test_fsdp_param_shardings_structure_matches():
    model, params, tx, *_ = _vit_setup()
    mesh = make_mesh(n_devices=8)
    sh = fsdp_param_shardings(params, mesh, min_size=256)
    assert (jax.tree_util.tree_structure(sh)
            == jax.tree_util.tree_structure(params))
