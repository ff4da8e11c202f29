"""Composed parallelism: one train step with dp x tp x pp simultaneously
(VERDICT r2 #6 — modes were only tested in isolation).

Mesh: make_mesh3 -> ('data', 'model', 'stage') = 2 x 2 x 2 over the 8
virtual CPU devices. The pipeline is manual shard_map over 'stage' only;
tensor-parallel param shardings over 'model' propagate through GSPMD inside
each stage; the batch stays sharded over 'data'. Equality vs the
single-device step, and physical-placement asserts for both the stage and
tensor shardings.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mop_tpu.models import (TransformerConfig, create_gpt_baseline,
                            create_gpt_mop, create_gpt_quartet)
from mop_tpu.parallel.mesh import make_mesh3
from mop_tpu.parallel.pp import (make_pp_tp_lm_train_step, merge_gpt_params,
                                 place_pp_tp_params)

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _setup(factory, **fkw):
    cfg = TransformerConfig(n_layer=4, n_head=4, n_embd=64, dropout=0.0,
                            block_size=16)
    model = factory(64, cfg, **fkw)
    rng = jax.random.PRNGKey(0)
    idx = np.random.RandomState(0).randint(0, 64, (16, 16)).astype(np.int32)
    tgt = np.roll(idx, -1, axis=-1).astype(np.int32)
    params = jax.tree_util.tree_map(
        np.asarray, model.init(rng, jnp.asarray(idx)))
    return model, cfg, params, jnp.asarray(idx), jnp.asarray(tgt)


def _ref_step(model, params, tx, idx, tgt):
    def lf(p):
        _, loss = model.apply(p, idx, targets=tgt, train=False)
        return loss
    loss, g = jax.value_and_grad(lf)(params)
    u, _ = tx.update(g, tx.init(params), params)
    return float(loss), optax.apply_updates(params, u)


@requires_8
@pytest.mark.parametrize("family", ["base", "quartet", "mop"])
def test_dp_tp_pp_composed_step_matches_single_device(family):
    factory, fkw = {
        "base": (create_gpt_baseline, {}),
        "quartet": (create_gpt_quartet, {}),
        "mop": (create_gpt_mop, dict(n_views=3, n_kernels=2)),
    }[family]
    model, cfg, params, idx, tgt = _setup(factory, **fkw)
    tx = optax.adamw(1e-3)
    ref_loss, p_ref = _ref_step(model, params, tx, idx, tgt)

    mesh = make_mesh3(n_devices=8, tensor_parallel=2, pipeline_parallel=2)
    assert dict(mesh.shape) == {"data": 2, "model": 2, "stage": 2}
    with mesh:
        stem, stacked, head = place_pp_tp_params(params, mesh, cfg.n_layer)
        opt = jax.jit(tx.init)((stem, stacked, head))
        step = make_pp_tp_lm_train_step(model, tx, mesh, n_microbatches=2)
        stem, stacked, head, opt, m = step(stem, stacked, head, opt, idx, tgt)

        # Physical placement: stage axis splits layers; a column-parallel
        # kernel is additionally split over 'model'.
        flat = dict(
            (jax.tree_util.keystr(p), l)
            for p, l in jax.tree_util.tree_flatten_with_path(stacked)[0])
        qkey = next(k for k in flat if "q_proj" in k and "kernel" in k)
        qleaf = flat[qkey]
        shard_shape = qleaf.addressable_shards[0].data.shape
        assert shard_shape[0] == cfg.n_layer // 2  # stage split
        assert shard_shape[-1] == qleaf.shape[-1] // 2  # tensor split

    np.testing.assert_allclose(float(m["loss"]), ref_loss, rtol=1e-5)
    p_out = merge_gpt_params(stem, stacked, head, cfg.n_layer)
    ref_flat = sorted(jax.tree_util.tree_flatten_with_path(p_ref)[0],
                      key=lambda t: str(t[0]))
    out_flat = sorted(jax.tree_util.tree_flatten_with_path(p_out)[0],
                      key=lambda t: str(t[0]))
    for (ka, a), (_, b) in zip(ref_flat, out_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4, err_msg=str(ka))


@requires_8
def test_ring_attention_inside_tp_block():
    """Ring attention (sequence ring over 'stage', manual_only shard_map)
    composed with tensor parallelism (heads/projections GSPMD-sharded over
    'model') and data parallelism — fwd and grads must match the dense
    single-device composition."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mop_tpu.ops.ring_attention import ring_attention

    mesh = make_mesh3(n_devices=8, tensor_parallel=2, pipeline_parallel=2)
    B, N, D, H = 2, 32, 64, 4
    dk = D // H
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, N, D))
    ws = [jax.random.normal(jax.random.fold_in(rng, i), (D, D)) * 0.1
          for i in range(1, 5)]

    def attn(x, wq, wk, wv, wo, use_ring):
        split = lambda y: y.reshape(B, N, H, dk).transpose(0, 2, 1, 3)
        q, k, v = split(x @ wq), split(x @ wk), split(x @ wv)
        if use_ring:
            q = jax.lax.with_sharding_constraint(
                q, NamedSharding(mesh, P(None, "model", "stage", None)))
            o = ring_attention(q, k, v, mesh, axis="stage", causal=True,
                               manual_only=True)
        else:
            s = jnp.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(dk)
            mask = jnp.tril(jnp.ones((N, N), bool))
            s = jnp.where(mask, s, -jnp.inf)
            o = jnp.einsum("bhnm,bhmd->bhnd", jax.nn.softmax(s, -1), v)
        return (o.transpose(0, 2, 1, 3).reshape(B, N, D)) @ wo

    def loss(x, wq, wk, wv, wo, use_ring):
        y = attn(x, wq, wk, wv, wo, use_ring)
        return jnp.sum(y * jnp.cos(y))

    # reference: dense, unsharded
    ref_y = attn(x, *ws, use_ring=False)
    ref_g = jax.grad(loss, argnums=(1, 2, 3, 4))(x, *ws, False)

    col = NamedSharding(mesh, P(None, "model"))
    row = NamedSharding(mesh, P("model", None))
    bsh = NamedSharding(mesh, P("data"))
    with mesh:
        xd = jax.device_put(x, bsh)
        wq = jax.device_put(ws[0], col)
        wk = jax.device_put(ws[1], col)
        wv = jax.device_put(ws[2], col)
        wo = jax.device_put(ws[3], row)
        y = jax.jit(lambda *a: attn(*a, True))(xd, wq, wk, wv, wo)
        g = jax.jit(jax.grad(lambda *a: loss(*a, True),
                             argnums=(1, 2, 3, 4)))(xd, wq, wk, wv, wo)

    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
