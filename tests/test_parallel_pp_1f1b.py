"""1F1B pipeline schedule: hand-scheduled fwd+bwd with dropout must equal
the single-device composition using identical dropout-key folding.

The GPipe step (test_parallel_pp.py) differentiates through the schedule and
requires dropout=0; the 1F1B step (mop_tpu/parallel/pp.py) seeds per-
microbatch losses on the last stage, recomputes stage forwards in the
backward slot, and threads fold_in(base, microbatch)->fold_in(., layer)
dropout keys — so training WITH dropout pipelines correctly. Equality
oracle: ``reference_1f1b_composition`` (same folding, no pipeline).
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
from mop_tpu.parallel.pp import (make_pp_lm_train_step_1f1b,
                                 merge_gpt_params, place_pp_params,
                                 pp_init_opt_state,
                                 reference_1f1b_composition,
                                 split_gpt_params)

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _setup(factory, dropout, n_layer=4, batch=16, **fkw):
    cfg = TransformerConfig(n_layer=n_layer, n_head=4, n_embd=64,
                            dropout=dropout, block_size=16)
    model = factory(64, cfg, **fkw)
    rng = jax.random.PRNGKey(0)
    idx = np.random.RandomState(0).randint(
        0, 64, (batch, 16)).astype(np.int32)
    tgt = np.roll(idx, -1, axis=-1).astype(np.int32)
    params = jax.tree_util.tree_map(
        np.asarray, model.init(rng, jnp.asarray(idx)))
    return model, cfg, params, jnp.asarray(idx), jnp.asarray(tgt)


def _tree_allclose(a, b, rtol, atol):
    fa = sorted(jax.tree_util.tree_flatten_with_path(a)[0],
                key=lambda t: str(t[0]))
    fb = sorted(jax.tree_util.tree_flatten_with_path(b)[0],
                key=lambda t: str(t[0]))
    assert len(fa) == len(fb)
    for (ka, x), (_, y) in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol, err_msg=str(ka))


@requires_8
@pytest.mark.parametrize("pp,micro", [(2, 4), (4, 2), (2, 8), (4, 8)])
@pytest.mark.parametrize("family,dropout", [
    ("base", 0.0), ("base", 0.1), ("quartet", 0.1), ("mop", 0.1)])
def test_1f1b_step_matches_composition(pp, micro, family, dropout):
    factory, fkw = {
        "base": (create_gpt_baseline, {}),
        "quartet": (create_gpt_quartet, {}),
        "mop": (create_gpt_mop, dict(n_views=3, n_kernels=2)),
    }[family]
    # microbatch size must divide by the data-axis size (8 // pp)
    batch = max(16, micro * (8 // pp))
    model, cfg, params, idx, tgt = _setup(factory, dropout, batch=batch,
                                          **fkw)
    rng = jax.random.PRNGKey(7)

    stem0, stacked0, head0 = split_gpt_params(params, cfg.n_layer)
    ref_loss, (g_stem, g_stk, g_head) = reference_1f1b_composition(
        model, stem0, stacked0, head0, idx, tgt, rng, n_microbatches=micro,
        n_data=8 // pp)
    tx = optax.adamw(1e-3)
    u, _ = tx.update((g_stem, g_stk, g_head),
                     tx.init((stem0, stacked0, head0)),
                     (stem0, stacked0, head0))
    ref_after = optax.apply_updates((stem0, stacked0, head0), u)

    mesh = make_mesh(n_devices=8, model_parallel=pp)
    with mesh:
        stem, stacked, head = place_pp_params(params, mesh, cfg.n_layer)
        opt = pp_init_opt_state(tx, stem, stacked, head)
        step = make_pp_lm_train_step_1f1b(model, tx, mesh,
                                          n_microbatches=micro)
        stem, stacked, head, opt, m = step(stem, stacked, head, opt, idx,
                                           tgt, rng)
        leaf = jax.tree_util.tree_leaves(stacked)[0]
        assert leaf.addressable_shards[0].data.shape[0] == cfg.n_layer // pp

    np.testing.assert_allclose(float(m["loss"]), float(ref_loss), rtol=1e-6)
    _tree_allclose((stem, stacked, head), ref_after, rtol=2e-3, atol=5e-4)


@requires_8
def test_1f1b_matches_gpipe_at_zero_dropout():
    """At dropout=0 the 1F1B step and the AD-through-GPipe step compute the
    same update."""
    from mop_tpu.parallel.pp import make_pp_lm_train_step

    model, cfg, params, idx, tgt = _setup(create_gpt_baseline, 0.0)
    tx = optax.adamw(1e-3)
    mesh = make_mesh(n_devices=8, model_parallel=2)
    outs = {}
    for name, make in (("gpipe", make_pp_lm_train_step),
                       ("1f1b", make_pp_lm_train_step_1f1b)):
        with mesh:
            stem, stacked, head = place_pp_params(params, mesh, cfg.n_layer)
            opt = pp_init_opt_state(tx, stem, stacked, head)
            step = make(model, tx, mesh, n_microbatches=4)
            args = (stem, stacked, head, opt, idx, tgt)
            if name == "1f1b":
                args = args + (jax.random.PRNGKey(0),)
            stem, stacked, head, opt, m = step(*args)
        outs[name] = (float(m["loss"]),
                      merge_gpt_params(stem, stacked, head, cfg.n_layer))
    np.testing.assert_allclose(outs["gpipe"][0], outs["1f1b"][0], rtol=1e-6)
    _tree_allclose(outs["gpipe"][1], outs["1f1b"][1], rtol=2e-3, atol=5e-4)
