"""Pipeline parallelism: GPipe over the model axis equals single-device math.

The schedule (mop_tpu/parallel/pp.py) pipelines the transformer block stack
over S stages with ppermute handoffs; embedding/head/loss run outside. The
forward loss must match model.apply exactly, and one full AdamW train step
must match the single-device step within reduction-order tolerance. Runs on
the 8-virtual-CPU-device mesh from conftest.py.
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
from mop_tpu.parallel import make_mesh
from mop_tpu.parallel.pp import (make_pp_lm_train_step, merge_gpt_params,
                                 place_pp_params, pp_init_opt_state)

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
@pytest.mark.parametrize("pp,micro", [(2, 4), (4, 2)])
@pytest.mark.parametrize("family", ["mop", "base", "quartet"])
def test_pp_train_step_matches_single_device(pp, micro, family):
    factory, fkw = {
        "mop": (create_gpt_mop, dict(n_views=3, n_kernels=2)),
        "base": (create_gpt_baseline, {}),
        "quartet": (create_gpt_quartet, {}),
    }[family]
    model, cfg, params, idx, tgt = _setup(factory, **fkw)
    tx = optax.adamw(1e-3)
    ref_loss, p_ref = _ref_step(model, params, tx, idx, tgt)

    mesh = make_mesh(n_devices=8, model_parallel=pp)
    with mesh:
        stem, stacked, head = place_pp_params(params, mesh, cfg.n_layer)
        opt = pp_init_opt_state(tx, stem, stacked, head)
        step = make_pp_lm_train_step(model, tx, mesh, n_microbatches=micro)
        stem, stacked, head, opt, m = step(stem, stacked, head, opt, idx, tgt)
        # Stage weights are physically partitioned, not replicated.
        leaf = jax.tree_util.tree_leaves(stacked)[0]
        assert leaf.addressable_shards[0].data.shape[0] == cfg.n_layer // pp

    np.testing.assert_allclose(float(m["loss"]), ref_loss, rtol=1e-6)
    p_pp = merge_gpt_params(stem, stacked, head, cfg.n_layer)
    ref_flat = sorted(jax.tree_util.tree_flatten_with_path(p_ref)[0],
                      key=lambda t: str(t[0]))
    pp_flat = sorted(jax.tree_util.tree_flatten_with_path(p_pp)[0],
                     key=lambda t: str(t[0]))
    for (ka, a), (_, b) in zip(ref_flat, pp_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4, err_msg=str(ka))


@requires_8
def test_pp_quartet_step_with_fused_kernel(monkeypatch):
    """Grads through a quartet PP step with the fused quartet kernel
    DISPATCHED (ADVICE r2 high: pallas forward under jax.value_and_grad in
    the stage scan used to have no VJP and crashed at trace time on TPU;
    CPU runs only passed because _on_tpu() fell back)."""
    from jax.experimental.pallas import tpu as pltpu

    from mop_tpu import config as mcfg
    from mop_tpu.ops import fused as F

    model, cfg, params, idx, tgt = _setup(create_gpt_quartet)
    tx = optax.adamw(1e-3)
    ref_loss, p_ref = _ref_step(model, params, tx, idx, tgt)

    monkeypatch.setattr(F, "_on_tpu", lambda: True)
    old = mcfg.config.fused_quartet
    mesh = make_mesh(n_devices=8, model_parallel=2)
    try:
        mcfg.config.fused_quartet = True
        with mesh, pltpu.force_tpu_interpret_mode():
            stem, stacked, head = place_pp_params(params, mesh, cfg.n_layer)
            opt = pp_init_opt_state(tx, stem, stacked, head)
            step = make_pp_lm_train_step(model, tx, mesh, n_microbatches=2)
            stem, stacked, head, opt, m = step(
                stem, stacked, head, opt, idx, tgt)
    finally:
        mcfg.config.fused_quartet = old
    np.testing.assert_allclose(float(m["loss"]), ref_loss, rtol=2e-5)
    p_pp = merge_gpt_params(stem, stacked, head, cfg.n_layer)
    ref_flat = sorted(jax.tree_util.tree_flatten_with_path(p_ref)[0],
                      key=lambda t: str(t[0]))
    pp_flat = sorted(jax.tree_util.tree_flatten_with_path(p_pp)[0],
                     key=lambda t: str(t[0]))
    for (ka, a), (_, b) in zip(ref_flat, pp_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4, err_msg=str(ka))
