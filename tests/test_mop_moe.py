"""MoE-MLP ViT variant (reference ``tests/test_mop_moe.py``)."""

import jax
import jax.numpy as jnp


def test_vit_mop_moe_forward():
    from mop_tpu.models import ViT_MoP

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))
    m = ViT_MoP(
        dim=64, depth=2, heads=4, n_classes=10, n_views=3, n_kernels=2,
        use_moe=True, moe_experts=3,
    )
    y = m.apply(m.init(jax.random.PRNGKey(1), x), x)
    assert y.shape == (2, 10)
