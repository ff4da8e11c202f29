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


def test_budget_matcher_agrees_with_reference():
    """The ab5 matching engine must select the exact configs the reference's
    matcher selects (verified against the torch implementation for the 5M
    target: A dim224/depth8/heads4 -> 4,872,000; B dim216/depth8/heads4 ->
    4,534,044, not within 1%)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from experiments import common as C
    from mop_tpu.models import ViT_Baseline, ViT_MoP

    a_cfg, a_p = C.find_config_for_target(
        ViT_Baseline, n_classes=100, target_params=5_000_000)
    assert a_cfg == {"dim": 224, "depth": 8, "heads": 4}
    assert a_p == 4_872_000
    b_cfg, b_p, within = C.find_model_config_match_baseline(
        ViT_MoP, n_classes=100, target_params=5_000_000,
        baseline_cfg=a_cfg, baseline_params=a_p, max_ratio_diff=0.01,
        extra_kwargs={"n_views": 5, "n_kernels": 3})
    assert b_cfg == {"dim": 216, "depth": 8, "heads": 4}
    assert b_p == 4_534_044
    assert within is False
