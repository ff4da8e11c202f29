"""Compiled-collective assertions: the parallel strategies must LOWER to
the expected XLA collectives with sane data volumes (VERDICT r3 #6).

The equality tests (test_parallel*.py) prove values; these prove the
compiled program — a GSPMD regression that silently replicates instead of
sharding would keep every numeric test green while multiplying
communication or memory. Lowered on the 8-virtual-CPU-device mesh (the
strongest evidence available without multi-chip hardware; XLA:TPU may
fuse differently but inserts the same collective *kinds* for the same
shardings). Byte volumes come from each collective op's result shapes
(``mop_tpu.utils.hlo_inspect``).
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mop_tpu.models import TransformerConfig, ViT_MoP, create_gpt_quartet
from mop_tpu.ops.preprocess import CIFAR10_MEAN, CIFAR10_STD
from mop_tpu.parallel import make_mesh, replicate, shard_batch
from mop_tpu.utils import collective_summary

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _n_params(tree):
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def _vit():
    model = ViT_MoP(dim=32, depth=2, heads=2, n_classes=10, n_views=2,
                    n_kernels=1, drop_path=0.0)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng},
                        jnp.zeros((8, 3, 32, 32)), train=True)
    return model, params


@requires_8
def test_dp_lowers_to_gradient_allreduce():
    """Data parallelism: the ONLY cross-device traffic is the gradient
    all-reduce — total all-reduce bytes must track the trainable param
    bytes (fp32), not activations, and nothing else may move."""
    from mop_tpu.parallel import make_classifier_train_step

    model, params = _vit()
    mesh = make_mesh(n_devices=8)
    tx = optax.adamw(1e-3)
    opt = tx.init(params)
    x = np.zeros((16, 3, 32, 32), np.uint8)
    y = np.zeros((16,), np.int32)
    with mesh:
        params = replicate(params, mesh)
        opt = replicate(opt, mesh)
        xb, yb = shard_batch((x, y), mesh)
        step = make_classifier_train_step(
            model, tx, mesh, CIFAR10_MEAN, CIFAR10_STD, augment=False,
            compute_dtype=None)
        txt = step.lower(params, opt, xb, yb,
                         jax.random.PRNGKey(1)).compile().as_text()
    s = collective_summary(txt)
    assert "all-reduce" in s, s
    grad_bytes = 4 * _n_params(params)
    ar = s["all-reduce"]["bytes"]
    # grads exactly once, plus small metric/loss scalars — never 2x
    # (which would mean params or activations are riding the wire)
    assert grad_bytes <= ar <= int(1.25 * grad_bytes) + 16384, \
        (ar, grad_bytes)
    for op in ("all-gather", "all-to-all"):
        assert op not in s, (op, s)


@requires_8
def test_tp_lowers_to_activation_allreduce():
    """Tensor parallelism: row-parallel matmul partial sums force
    all-reduces; total bytes must stay well under the replicate-the-
    model failure mode (param bytes x steps)."""
    from mop_tpu.parallel.tp import (make_tp_lm_train_step,
                                     tp_init_opt_state, tp_shard_params)

    cfg = TransformerConfig(n_layer=2, n_head=4, n_embd=64, dropout=0.0,
                            block_size=16)
    model = create_gpt_quartet(64, cfg)
    idx = jnp.zeros((8, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), idx)
    mesh = make_mesh(n_devices=8)
    tx = optax.adamw(1e-3)
    with mesh:
        sp = tp_shard_params(params, mesh)
        opt = tp_init_opt_state(tx, sp)
        step = make_tp_lm_train_step(model, tx, mesh)
        txt = step.lower(sp, opt, idx, idx,
                         jax.random.PRNGKey(1)).compile().as_text()
    s = collective_summary(txt)
    assert "all-reduce" in s and s["all-reduce"]["count"] >= 1, s
    assert s["all-reduce"]["bytes"] > 0


@requires_8
def test_fsdp_lowers_to_allgather_plus_grad_reduction():
    """FSDP/ZeRO-3: sharded params must be ALL-GATHERED for compute
    (the signature op — its absence means params silently replicated)
    and gradients reduced (reduce-scatter or all-reduce+slice)."""
    from mop_tpu.parallel.fsdp import (fsdp_init_opt_state,
                                       fsdp_shard_params,
                                       make_fsdp_classifier_train_step)

    model, params = _vit()
    mesh = make_mesh(n_devices=8)
    tx = optax.adamw(1e-3)
    x = jnp.zeros((8, 3, 32, 32), jnp.uint8)
    y = jnp.zeros((8,), jnp.int32)
    with mesh:
        sp = fsdp_shard_params(params, mesh)
        opt = fsdp_init_opt_state(tx, sp, mesh)
        step = make_fsdp_classifier_train_step(
            model, tx, mesh, CIFAR10_MEAN, CIFAR10_STD)
        txt = step.lower(sp, opt, x, y,
                         jax.random.PRNGKey(1)).compile().as_text()
    s = collective_summary(txt)
    assert "all-gather" in s and s["all-gather"]["count"] >= 1, s
    assert ("reduce-scatter" in s) or ("all-reduce" in s), s
    # gathers move at most ~the param bytes per direction (fwd + bwd
    # remat can double it; 4x would mean a pathological schedule)
    pb = 4 * _n_params(params)
    assert s["all-gather"]["bytes"] <= 4 * pb, (s, pb)


@requires_8
def test_pp_lowers_to_collective_permute():
    """GPipe pipeline: stage handoffs are collective-permutes whose
    payload is one microbatch activation slab, nothing bigger."""
    from mop_tpu.parallel.pp import (make_pp_lm_train_step,
                                     place_pp_params, pp_init_opt_state)

    cfg = TransformerConfig(n_layer=4, n_head=4, n_embd=64, dropout=0.0,
                            block_size=16)
    model = create_gpt_quartet(64, cfg)
    idx = jnp.zeros((16, 16), jnp.int32)
    params = jax.tree_util.tree_map(
        np.asarray, model.init(jax.random.PRNGKey(0), idx))
    tx = optax.adamw(1e-3)
    mesh = make_mesh(n_devices=8, model_parallel=4)
    with mesh:
        stem, stacked, head = place_pp_params(params, mesh, cfg.n_layer)
        opt = pp_init_opt_state(tx, stem, stacked, head)
        step = make_pp_lm_train_step(model, tx, mesh, n_microbatches=4)
        txt = step.lower(stem, stacked, head, opt, idx,
                         idx).compile().as_text()
    s = collective_summary(txt)
    assert "collective-permute" in s, s
    cp = s["collective-permute"]
    assert cp["count"] >= 2, s  # >= one forward + one backward handoff
    micro_act = (16 // 4) * 16 * 64 * 4  # micro_b x T x D x fp32
    assert cp["bytes"] <= cp["count"] * micro_act, (cp, micro_act)


@requires_8
def test_ring_attention_lowers_to_collective_permute():
    """Ring attention: K/V blocks rotate via collective-permute; each
    hop moves only the local K/V block (never the full sequence)."""
    from mop_tpu.ops.ring_attention import ring_attention

    mesh = make_mesh(n_devices=8, model_parallel=8)
    b, h, n, dk = 2, 2, 64, 16
    q = jnp.zeros((b, h, n, dk), jnp.float32)

    def loss(q, k, v):
        return ring_attention(q, k, v, mesh, axis="model",
                              causal=True).sum()

    with mesh:
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        txt = g.lower(q, q, q).compile().as_text()
    s = collective_summary(txt)
    assert "collective-permute" in s, s
    cp = s["collective-permute"]
    assert cp["count"] >= 2, s  # fwd rotation + bwd rotation
    block = b * h * (n // 8) * dk * 4  # one local K or V block, fp32
    # each permute op moves at most K+V (+ their grads in bwd) blocks
    assert cp["bytes"] <= cp["count"] * 4 * block, (cp, block)
    assert "all-gather" not in s, s  # the ring never gathers the seq


@requires_8
def test_expert_parallel_moe_lowers_to_all_to_all():
    """Expert parallelism: dispatch + combine are exactly two
    all-to-alls, and traffic is O(tokens x d_model) — NOT
    O(tokens x d_model x experts), the replicate-everything failure."""
    from mop_tpu.ops.moe import expert_parallel_top1_mlp

    mesh = make_mesh(n_devices=8, model_parallel=8)
    E, D, H, T = 8, 32, 64, 128
    x = jnp.zeros((T, D))
    gw = jnp.zeros((D, E))
    gb = jnp.zeros((E,))
    w1 = jnp.zeros((E, D, H))
    w2 = jnp.zeros((E, H, D))
    with mesh:
        fn = jax.jit(lambda *a: expert_parallel_top1_mlp(
            *a, act=jax.nn.gelu, mesh=mesh))
        txt = fn.lower(x, gw, gb, w1, w2).compile().as_text()
    s = collective_summary(txt)
    assert "all-to-all" in s and s["all-to-all"]["count"] == 2, s
    token_bytes = T * D * 4
    # capacity_factor 1.25 + slot padding; 4x tokens would mean the
    # expert axis is riding the wire
    assert s["all-to-all"]["bytes"] <= 4 * token_bytes, (s, token_bytes)
    assert "all-gather" not in s, s  # expert weights never replicate
