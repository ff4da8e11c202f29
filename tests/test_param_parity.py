"""Parameter-parity contract (reference ``tests/test_param_parity.py``)."""

import jax
import jax.numpy as jnp
import numpy as np

from mop_tpu.models import ViT_Baseline, ViT_MoP
from mop_tpu.models.vit_edgewise import ViTEdgewise


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def _init(model, shape=(1, 3, 32, 32)):
    return model.init(jax.random.PRNGKey(0), jnp.zeros(shape))


def test_param_counts_close():
    b = ViT_Baseline(dim=256, depth=6, heads=4, n_classes=10)
    m = ViT_MoP(dim=256, depth=6, heads=4, n_classes=10, n_views=5, n_kernels=3)
    pb, pm = count_params(_init(b)), count_params(_init(m))
    assert abs(pb - pm) / max(pb, pm) < 0.02


def test_param_counts_exact_vs_reference():
    """The torch reference counts these exact values; the param-budget matching
    engine depends on reproducing them (see SURVEY.md §2.4)."""
    b = ViT_Baseline(dim=256, depth=6, heads=4, n_classes=10)
    m = ViT_MoP(dim=256, depth=6, heads=4, n_classes=10, n_views=5, n_kernels=3)
    assert count_params(_init(b)) == 4_756_480
    assert count_params(_init(m)) == 4_758_612


def test_edgewise_forward_and_params():
    b = ViT_Baseline(dim=128, depth=2, heads=2, n_classes=10)
    e = ViTEdgewise(
        dim=128,
        depth=2,
        heads=2,
        n_classes=10,
        use_k3=True,
        gate_mode="lowrank",
        gate_rank=2,
        gate_init="nor",
    )
    x = jnp.zeros((1, 3, 32, 32))
    pe = e.init(jax.random.PRNGKey(0), x)
    ye = e.apply(pe, x)
    assert ye.shape == (1, 10)
    pb = count_params(_init(b))
    assert count_params(pe) <= pb * 4
