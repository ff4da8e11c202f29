"""Tensor-parallel serving: the decode engine with TP-sharded params.

The engine's jitted step is an ordinary function of the params pytree, so
placing Megatron-sharded params (``tp_shard_params``) on a ('data',
'model') mesh makes GSPMD partition every decode matmul over the model
axis — no engine changes, collectives inserted by XLA. The contract: a
TP-served stream emits exactly the tokens the single-device engine emits.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mop_tpu.models import TransformerConfig, create_gpt_quartet
from mop_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from mop_tpu.parallel.tp import tp_shard_params
from mop_tpu.serving import DecodeEngine, SpecDecodeEngine

VOCAB = 50
JOBS = [([3, 1, 4, 1, 5], 12), ([2, 7, 9], 8), ([11], 10)]


def _model(n_layer=2, n_embd=64, n_head=4, seed=1):
    cfg = TransformerConfig(n_layer=n_layer, n_head=n_head, n_embd=n_embd,
                            dropout=0.0, block_size=64)
    model = create_gpt_quartet(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 8), jnp.int32))
    return model, params


def _run(engine, jobs):
    rids = [engine.submit(*j) for j in jobs]
    res = engine.run()
    return [res[r] for r in rids]


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(model_parallel=4)


def test_tp_sharded_params_match_plain_engine(mesh):
    model, params = _model()
    ref = _run(DecodeEngine(model, params, max_batch=3), JOBS)
    sharded = tp_shard_params(params, mesh)
    out = _run(DecodeEngine(model, sharded, max_batch=3), JOBS)
    assert out == ref


def test_tp_with_head_sharded_kv_cache(mesh):
    model, params = _model(n_head=4)
    ref = _run(DecodeEngine(model, params, max_batch=3), JOBS)
    sharded = tp_shard_params(params, mesh)
    kv_sh = NamedSharding(mesh, P(None, None, MODEL_AXIS, None, None))
    eng = DecodeEngine(model, sharded, max_batch=3, cache_sharding=kv_sh)
    assert _run(eng, JOBS) == ref
    # the pool really is head-sharded over the model axis (trailing Nones
    # are normalized away by jax, so compare the head axis entry)
    spec = tuple(eng._cache["k"].sharding.spec)
    assert len(spec) >= 3 and spec[2] == MODEL_AXIS, spec


def test_tp_speculative_engine_matches_plain(mesh):
    target, tparams = _model(n_layer=3, seed=1)
    draft, dparams = _model(n_layer=1, n_embd=32, n_head=2, seed=7)
    ref = _run(SpecDecodeEngine(target, tparams, draft, dparams,
                                max_batch=3, gamma=3), JOBS)
    st = tp_shard_params(tparams, mesh)
    kv_sh = NamedSharding(mesh, P(None, None, MODEL_AXIS, None, None))
    out = _run(SpecDecodeEngine(target, st, draft, dparams, max_batch=3,
                                gamma=3, cache_sharding=kv_sh), JOBS)
    assert out == ref


def test_tp_sharded_gpt_mop_matches_plain_engine(mesh):
    """TP-served GPT_MoP (the views projection matches the row-parallel
    'proj' rule; gate convs replicate) == single-device engine."""
    from mop_tpu.models import create_gpt_mop_causal

    cfg = TransformerConfig(n_layer=2, n_head=4, n_embd=64, dropout=0.0,
                            block_size=64, use_quartet=False)
    model = create_gpt_mop_causal(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 8), jnp.int32))
    ref = _run(DecodeEngine(model, params, max_batch=3), JOBS)
    sharded = tp_shard_params(params, mesh)
    with mesh:
        got = _run(DecodeEngine(model, sharded, max_batch=3), JOBS)
    assert got == ref
