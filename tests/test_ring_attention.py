"""Ring attention (context parallelism) equals full attention, fwd and bwd.

The sequence axis is sharded over the mesh model axis; K/V blocks rotate via
ppermute with flash-style online-softmax accumulation. Values and gradients
must match dense softmax attention computed on one device.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.ops.ring_attention import ring_attention
from mop_tpu.parallel import make_mesh

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _full_attention(q, k, v, causal):
    dk = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / jnp.sqrt(dk)
    if causal:
        n = q.shape[2]
        mask = jnp.tril(jnp.ones((n, n), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", a.astype(v.dtype), v)


def _qkv(n=64, b=2, h=3, dk=16, seed=0):
    rs = np.random.RandomState(seed)
    mk = lambda s: jnp.asarray(rs.randn(b, h, n, dk).astype(np.float32))
    return mk(0), mk(1), mk(2)


@requires_8
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("ring", [2, 4, 8])
def test_ring_matches_full_forward(causal, ring):
    q, k, v = _qkv()
    mesh = make_mesh(n_devices=8, model_parallel=ring)
    ours = ring_attention(q, k, v, mesh, causal=causal)
    ref = _full_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


@requires_8
@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_full_grads(causal):
    q, k, v = _qkv(n=32, h=2)
    mesh = make_mesh(n_devices=8, model_parallel=4)

    def loss_ring(q, k, v):
        w = jnp.sin(jnp.arange(q.shape[-1], dtype=jnp.float32))
        return jnp.sum(ring_attention(q, k, v, mesh, causal=causal) * w)

    def loss_full(q, k, v):
        w = jnp.sin(jnp.arange(q.shape[-1], dtype=jnp.float32))
        return jnp.sum(_full_attention(q, k, v, causal) * w)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)


@requires_8
def test_ring_long_sequence_never_materializes_nxn():
    # 8192 tokens over 8 shards: each shard sees at most (1024 x 1024)
    # score blocks. Just prove it runs and matches on a spot check.
    q, k, v = _qkv(n=1024, b=1, h=1, dk=8)
    mesh = make_mesh(n_devices=8, model_parallel=8)
    ours = ring_attention(q, k, v, mesh, causal=True)
    ref = _full_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
