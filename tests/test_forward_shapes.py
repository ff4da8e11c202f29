"""Forward-shape contract (reference ``tests/test_forward_shapes.py``)."""

import jax
import jax.numpy as jnp

from mop_tpu.models import ViT_Baseline, ViT_MoP
from mop_tpu.models.vit_edgewise import ViTEdgewise


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


def test_vit_shapes():
    x = _rand(0, (2, 3, 32, 32))
    b = ViT_Baseline(dim=256, depth=2, heads=2, n_classes=10)
    m = ViT_MoP(dim=256, depth=2, heads=2, n_classes=10, n_views=2, n_kernels=1)
    yb = b.apply(b.init(jax.random.PRNGKey(1), x), x)
    ym = m.apply(m.init(jax.random.PRNGKey(2), x), x)
    assert yb.shape == (2, 10)
    assert ym.shape == (2, 10)


def test_gate_api():
    x = _rand(0, (2, 3, 32, 32))
    m = ViT_MoP(dim=256, depth=2, heads=2, n_classes=10, n_views=2, n_kernels=1)
    p = m.init(jax.random.PRNGKey(1), x)
    gates, views, kernels = m.apply(p, x, method=m.get_gate_maps)
    assert gates.ndim == 4 and gates.shape[1] == 1


def test_edgewise_shapes_cifar10():
    x = _rand(0, (2, 3, 32, 32))
    e = ViTEdgewise(dim=128, depth=2, heads=2, n_classes=10, use_k3=True)
    ye = e.apply(e.init(jax.random.PRNGKey(1), x), x)
    assert ye.shape == (2, 10)


def test_edgewise_lowrank_and_presets():
    x = _rand(0, (1, 3, 32, 32))
    e1 = ViTEdgewise(
        dim=128,
        depth=2,
        heads=2,
        n_classes=10,
        use_k3=False,
        gate_mode="lowrank",
        gate_rank=2,
        gate_init="xor",
    )
    y1 = e1.apply(e1.init(jax.random.PRNGKey(1), x), x)
    assert y1.shape == (1, 10)
    e2 = ViTEdgewise(
        dim=128,
        depth=2,
        heads=2,
        n_classes=10,
        use_k3=True,
        gate_mode="dense",
        gate_init="and",
    )
    y2 = e2.apply(e2.init(jax.random.PRNGKey(2), x), x)
    assert y2.shape == (1, 10)
