"""VOC localizer contract (reference ``tests/test_voc_localization.py``)."""

import jax
import jax.numpy as jnp

from mop_tpu.models.vit_localizer import ViTLocalizer, bbox_iou


def test_vit_localizer_forward_and_iou():
    model = ViTLocalizer(
        dim=64, depth=2, heads=4, mlp_ratio=2.0, drop_path=0.0,
        patch=16, img_size=32,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))
    params = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(params, x)
    assert y.shape == (2, 4)
    assert bool(jnp.all((y >= 0) & (y <= 1)))

    iou = bbox_iou(y, y)
    assert bool(jnp.isfinite(iou).all())
    assert bool(((iou >= 0) & (iou <= 1)).all())
    assert jnp.allclose(iou, jnp.ones_like(iou), atol=1e-6)


def test_vit_localizer_modes():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32))
    for mode, kwargs in [("B", None), ("E", dict(n_views=2, gate_mode="lowrank",
                                                 gate_rank=2))]:
        m = ViTLocalizer(dim=64, depth=2, heads=4, patch=16, img_size=32,
                         attn_mode=mode, attn_kwargs=kwargs,
                         mop_views=2, mop_kernels=1)
        p = m.init(jax.random.PRNGKey(1), x)
        y = m.apply(p, x)
        assert y.shape == (1, 4)
