"""Multi-LoRA serving: requests with DIFFERENT LoRA adapters batch into
one fixed-shape decode step.

Load-bearing properties:
- a request served in a MIXED batch (adapters x, y, and base interleaved)
  emits bit-for-bit what the same request emits alone in its own engine
  (the per-row factor rows really are per-row);
- an adapter request's tokens equal the single-stream ``generate_cached``
  sampler on ``lora_merge``'d params (the decomposed x@W + (x@A)@B path
  computes the merged model);
- the prefix cache never reuses K/V rows across adapters (rows depend on
  the factors);
- paged preemption re-admits under the request's own adapter.

Beyond-reference capability (the reference has no fine-tuning and no
serving at all, SURVEY §0); the multi-adapter batching follows the S-LoRA
/ Punica pattern, TPU-style: fixed-shape gathered factor stacks instead of
custom CUDA gather kernels.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import (TransformerConfig, create_gpt_quartet,
                            generate_cached)
from mop_tpu.serving import DecodeEngine, PagedDecodeEngine, SpecDecodeEngine
from mop_tpu.training import lora_init, lora_merge

VOCAB = 50


def _setup(block=32):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=block)
    model = create_gpt_quartet(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


def _adapter(params, seed, rank=2, b_std=0.08):
    """lora_init factors with NONZERO b (zero-init b would make the delta
    vanish and the test vacuous)."""
    ad = lora_init(jax.random.PRNGKey(seed), params, rank=rank)
    out = {}
    key = jax.random.PRNGKey(seed + 1000)
    for path, fac in sorted(ad.items()):
        key, sub = jax.random.split(key)
        out[path] = {"a": fac["a"],
                     "b": jax.random.normal(sub, fac["b"].shape) * b_std}
    return out


def _merged_ref(model, params, ad, prompt, max_new):
    p = params if ad is None else lora_merge(params, ad)
    out = generate_cached(model, p, jnp.asarray(prompt, jnp.int32)[None],
                          max_new_tokens=max_new)
    return np.asarray(out)[0, len(prompt):].tolist()


def test_mixed_batch_equals_solo():
    model, params = _setup()
    adapters = {"x": _adapter(params, 0), "y": _adapter(params, 7)}
    prompts = [[5, 17, 3], [9, 2], [11, 4, 4, 8]]
    names = ["x", None, "y"]

    eng = DecodeEngine(model, params, max_batch=4, adapters=adapters)
    rids = [eng.submit(p, 8, adapter=nm) for p, nm in zip(prompts, names)]
    mixed = eng.run()

    for p, nm, rid in zip(prompts, names, rids):
        solo = DecodeEngine(model, params, max_batch=4, adapters=adapters)
        sr = solo.submit(p, 8, adapter=nm)
        assert solo.run()[sr] == mixed[rid], f"adapter {nm}: mixed != solo"


def test_adapter_request_matches_merged_params():
    model, params = _setup()
    adx, ady = _adapter(params, 0), _adapter(params, 7)
    eng = DecodeEngine(model, params, max_batch=4,
                       adapters={"x": adx, "y": ady})
    prompts = [[5, 17, 3], [9, 2], [11, 4, 4, 8]]
    rids = [eng.submit(prompts[0], 8, adapter="x"),
            eng.submit(prompts[1], 8, adapter="y"),
            eng.submit(prompts[2], 8)]
    got = eng.run()
    for p, ad, rid in zip(prompts, [adx, ady, None], rids):
        assert got[rid] == _merged_ref(model, params, ad, p, 8)
    # the three streams must actually differ (nonzero deltas)
    assert len({tuple(got[r]) for r in rids}) == 3


def test_adapter_scale_is_applied():
    model, params = _setup()
    ad = _adapter(params, 0)
    eng = DecodeEngine(model, params, max_batch=2, adapters={"x": ad},
                       adapter_scale={"x": 2.5})
    rid = eng.submit([5, 17, 3], 8, adapter="x")
    merged = generate_cached(
        model, lora_merge(params, ad, scale=2.5),
        jnp.asarray([[5, 17, 3]], jnp.int32), max_new_tokens=8)
    assert eng.run()[rid] == np.asarray(merged)[0, 3:].tolist()


def test_prefix_cache_is_adapter_keyed():
    model, params = _setup()
    ad = _adapter(params, 0)
    prompt = [7, 1, 13, 22, 5, 9]
    eng = DecodeEngine(model, params, max_batch=2, adapters={"x": ad},
                       prefix_cache_entries=4)
    r1 = eng.submit(prompt, 6, adapter="x")
    out1 = eng.run()[r1]
    # same prompt under the BASE model: must NOT reuse x's K/V rows
    r2 = eng.submit(prompt, 6)
    out2 = eng.run()[r2]
    assert eng.prefix_cache_hits == 0
    assert out1 == _merged_ref(model, params, ad, prompt, 6)
    assert out2 == _merged_ref(model, params, None, prompt, 6)
    # same prompt under the SAME adapter: exact reuse
    r3 = eng.submit(prompt + [2], 6, adapter="x")
    out3 = eng.run()[r3]
    assert eng.prefix_cache_hits == 1
    assert out3 == _merged_ref(model, params, ad, prompt + [2], 6)


def test_paged_engine_mixed_adapters_with_preemption():
    model, params = _setup(block=32)
    adapters = {"x": _adapter(params, 0), "y": _adapter(params, 7)}
    # tiny pool forces growth-page preemption; re-admission must keep the
    # victim's adapter (the requeued tuple carries its aid)
    eng = PagedDecodeEngine(model, params, max_batch=3, n_pages=5,
                            page_size=8, adapters=adapters)
    prompts = [[5, 17, 3], [9, 2, 30], [11, 4]]
    names = ["x", "y", None]
    rids = [eng.submit(p, 12, adapter=nm) for p, nm in zip(prompts, names)]
    got = eng.run()
    assert eng.preemptions > 0, "scenario did not exercise preemption"
    for p, nm, rid in zip(prompts, names, rids):
        ad = adapters.get(nm)
        assert got[rid] == _merged_ref(model, params, ad, p, 12), \
            f"adapter {nm} diverged across preemption"


def test_adapter_validation():
    model, params = _setup()
    ad = _adapter(params, 0)
    eng = DecodeEngine(model, params, max_batch=2, adapters={"x": ad})
    with pytest.raises(ValueError, match="unknown adapter"):
        eng.submit([1, 2], 4, adapter="nope")
    # adapter on an engine without a bank is unknown too
    plain = DecodeEngine(model, params, max_batch=2)
    with pytest.raises(ValueError, match="unknown adapter"):
        plain.submit([1, 2], 4, adapter="x")
    # mismatched ranks across served adapters are rejected at construction
    bad = _adapter(params, 3, rank=4)
    with pytest.raises(ValueError, match="rank"):
        DecodeEngine(model, params, max_batch=2,
                     adapters={"x": ad, "y": bad})
    # a path set that doesn't exist in params is rejected
    with pytest.raises(ValueError, match="not found"):
        DecodeEngine(model, params, max_batch=2,
                     adapters={"x": {"params/nope/kernel": {
                         "a": jnp.zeros((4, 2)), "b": jnp.zeros((2, 4))}}})


def test_spec_engine_rejects_adapter():
    model, params = _setup()
    dmodel, dparams = _setup()
    eng = SpecDecodeEngine(model, params, dmodel, dparams, max_batch=2,
                           gamma=2)
    with pytest.raises(ValueError, match="greedy-only"):
        eng.submit([1, 2], 4, adapter="x")


def test_lora_serving_gpt_mop_causal():
    """Multi-LoRA over the namesake model: adapters (which also adapt the
    MoP views projection — a 2-D kernel) batch in one step and equal the
    merged-params single-stream sampler; base and adapter requests
    co-batch."""
    from mop_tpu.models import create_gpt_mop_causal

    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=32, use_quartet=False)
    model = create_gpt_mop_causal(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32))
    ad_x = _adapter(params, 7)
    assert any("views" in p for p in ad_x), sorted(ad_x)[:3]
    eng = DecodeEngine(model, params, max_batch=3,
                       adapters={"x": ad_x})
    r_base = eng.submit([1, 2, 3], max_new_tokens=10)
    r_x = eng.submit([1, 2, 3], max_new_tokens=10, adapter="x")
    out = eng.run()
    assert out[r_base] == _merged_ref(model, params, None, [1, 2, 3], 10)
    assert out[r_x] == _merged_ref(model, params, ad_x, [1, 2, 3], 10)
    # the adapter genuinely perturbs the model (greedy tokens may still
    # coincide on a degenerate random init — compare distributions)
    lg_b, _ = model.apply(params, jnp.asarray([[1, 2, 3]], jnp.int32))
    lg_x, _ = model.apply(lora_merge(params, ad_x),
                          jnp.asarray([[1, 2, 3]], jnp.int32))
    assert not np.allclose(np.asarray(lg_b), np.asarray(lg_x))
