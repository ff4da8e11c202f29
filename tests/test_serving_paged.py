"""Paged-KV serving engine: token equality, page accounting, preemption.

The paged engine must emit EXACTLY what the dense-slab engine emits — the
page table + gather is a memory-layout change, not a math change — while
holding cache HBM proportional to resident tokens and surviving pool
exhaustion by preempting + exactly re-prefilling the youngest request.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_baseline, \
    create_gpt_quartet
from mop_tpu.serving import DecodeEngine, PagedDecodeEngine


def _setup(use_quartet=True, block=32, vocab=50):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=block)
    mk = create_gpt_quartet if use_quartet else create_gpt_baseline
    model = mk(vocab, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


def _dense_run(model, params, jobs, max_batch=4, **kw):
    eng = DecodeEngine(model, params, max_batch=max_batch, **kw)
    rids = [eng.submit(p, n, **o) for p, n, o in jobs]
    res = eng.run()
    return [res[r] for r in rids]


@pytest.mark.parametrize("use_quartet", [True, False])
def test_paged_matches_dense_engine(use_quartet):
    """Mixed prompt lengths/budgets, ample pages: token streams equal the
    dense engine's exactly (same rng split sequence, same math)."""
    model, params = _setup(use_quartet)
    jobs = [([5, 17, 3, 41, 2, 9], 10, {}),
            ([1, 2, 3], 12, {}),
            ([7, 8, 9, 10, 11, 12, 13], 6, {}),
            ([40, 41], 9, {})]
    want = _dense_run(model, params, jobs)
    eng = PagedDecodeEngine(model, params, max_batch=4, n_pages=24,
                            page_size=8)
    rids = [eng.submit(p, n) for p, n, _ in jobs]
    res = eng.run()
    assert [res[r] for r in rids] == want
    assert eng.preemptions == 0
    assert eng.pages_in_use == 0  # everything reclaimed


def test_paged_matches_dense_engine_sampled():
    """Per-request sampling params follow the same rng stream."""
    model, params = _setup()
    jobs = [([5, 17, 3], 8, dict(temperature=0.9, top_k=12)),
            ([1, 2, 3, 4, 5], 8, dict(temperature=0.7, top_p=0.9)),
            ([9, 8], 8, {})]
    want = _dense_run(model, params, jobs, rng=jax.random.PRNGKey(7))
    eng = PagedDecodeEngine(model, params, max_batch=4, n_pages=16,
                            page_size=8, rng=jax.random.PRNGKey(7))
    rids = [eng.submit(p, n, **o) for p, n, o in jobs]
    res = eng.run()
    assert [res[r] for r in rids] == want


def test_page_growth_and_reclaim():
    """A request crossing page boundaries allocates lazily; retirement
    frees everything; peak accounting is honest."""
    model, params = _setup(block=32)
    eng = PagedDecodeEngine(model, params, max_batch=2, n_pages=8,
                            page_size=4)
    prompt = [5, 17, 3, 41, 2]  # t0=5 -> pages for pos 0..5 = 2 pages
    eng.submit(prompt, max_new_tokens=14)
    eng.step()  # admission + first decode
    assert eng.pages_in_use >= 2
    eng.run()
    # 5 + 14 tokens -> final position 19 -> ceil(20/4) = 5 pages peak
    assert eng.peak_pages_in_use == 5
    assert eng.pages_in_use == 0


def test_preemption_exact_greedy():
    """A pool too small for both requests forces preemption; the preempted
    request re-prefills its full prefix and finishes with EXACTLY the
    tokens of an un-preempted run."""
    model, params = _setup(block=32)
    jobs = [([5, 17, 3, 41, 2, 9, 11, 4], 16, {}),
            ([1, 2, 3, 4, 5, 6, 7, 8], 16, {})]
    want = _dense_run(model, params, jobs, max_batch=2)
    # pages_per_slot = 32/4 = 8; both requests eventually need 6 pages each
    # (24 positions) but the pool has only 9 usable pages -> must preempt
    eng = PagedDecodeEngine(model, params, max_batch=2, n_pages=9,
                            page_size=4)
    rids = [eng.submit(p, n) for p, n, _ in jobs]
    res = eng.run()
    assert eng.preemptions > 0
    assert [res[r] for r in rids] == want
    assert eng.pages_in_use == 0


def test_preemption_skips_full_window_victims():
    """A victim whose prefix already fills the context window cannot be
    re-prefilled (prompt length must stay < block_size): the preemptor
    must skip it — self-preempting the growing request if needed — and
    every stream must still finish with the un-preempted tokens.
    Regression: this used to crash with a page-table broadcast error."""
    model, params = _setup(block=8)
    # r0 runs to lens = block-1 (prefix = 8 = block -> ineligible victim);
    # r1 then needs a growth page from a dry pool.
    jobs = [([5, 17, 3, 41, 2], 3, {}),   # t0=5, fills to len 8 exactly
            ([1, 2], 6, {})]              # t0=2, crosses pages mid-flight
    want = _dense_run(model, params, jobs, max_batch=2)
    eng = PagedDecodeEngine(model, params, max_batch=2, n_pages=5,
                            page_size=2)
    rids = [eng.submit(p, n) for p, n, _ in jobs]
    res = eng.run()
    assert [res[r] for r in rids] == want
    assert eng.pages_in_use == 0


def test_admission_compiles_once_per_bucket():
    """Admission pads the page vector to full width, so distinct prompt
    lengths inside one bucket reuse ONE compiled admission function.
    The pinned property is that the compile count does NOT scale with
    distinct prompt lengths; one extra entry is tolerated because jit
    fns with donated args can recompile once when the second call sees
    the donated-output buffer layout (a jax artifact, not per-length)."""
    model, params = _setup()
    eng = PagedDecodeEngine(model, params, max_batch=4, n_pages=16,
                            page_size=4, prefill_buckets=[8])
    for p in ([1, 2], [1, 2, 3, 4, 5], [9, 8, 7, 6, 5, 4, 3]):
        eng.submit(p, 3)
    eng.run()
    sizes = eng._padm_padded_fn._cache_size()
    assert sizes <= 2, f"expected <=2 admission compiles, got {sizes}"
    # three MORE distinct lengths in the same bucket: zero new compiles
    for p in ([4], [4, 5, 6], [1, 3, 5, 7, 9, 2]):
        eng.submit(p, 3)
    eng.run()
    after = eng._padm_padded_fn._cache_size()
    assert after == sizes, (
        f"admission recompiled per prompt length: {sizes} -> {after}")


def test_oversubscribed_memory_footprint():
    """The headline: serve MORE concurrent slots than the dense slab could
    at the same cache HBM. 8 slots x block 64 dense = 512 rows; the paged
    pool holds 128 rows (+scratch) and still serves all 8 (short requests
    resident together)."""
    model, params = _setup(block=64)
    jobs = [(list(range(2 + i, 8 + i)), 6, {}) for i in range(8)]
    want = _dense_run(model, params, jobs, max_batch=8)
    eng = PagedDecodeEngine(model, params, max_batch=8, n_pages=16,
                            page_size=8)
    assert eng.cache_bytes() < eng.dense_equivalent_bytes() // 3
    rids = [eng.submit(p, n) for p, n, _ in jobs]
    res = eng.run()
    assert [res[r] for r in rids] == want
    # all 8 were genuinely resident at once at some point
    assert eng.peak_pages_in_use >= 8 * 2 - 2


def test_paged_with_prefill_buckets():
    model, params = _setup()
    jobs = [([5, 17, 3], 6, {}), ([1, 2, 3, 4, 5, 6, 7], 6, {})]
    want = _dense_run(model, params, jobs, prefill_buckets=[4, 8])
    eng = PagedDecodeEngine(model, params, max_batch=4, n_pages=16,
                            page_size=8, prefill_buckets=[4, 8])
    rids = [eng.submit(p, n) for p, n, _ in jobs]
    res = eng.run()
    assert [res[r] for r in rids] == want


def test_paged_cancel_frees_pages():
    model, params = _setup()
    eng = PagedDecodeEngine(model, params, max_batch=2, n_pages=8,
                            page_size=8)
    r0 = eng.submit([5, 17, 3], max_new_tokens=20)
    eng.step()
    assert eng.pages_in_use > 0
    assert eng.cancel(r0)
    eng.step()
    assert eng.pages_in_use == 0


def test_paged_validation():
    model, params = _setup(block=32)
    with pytest.raises(ValueError, match="divide"):
        PagedDecodeEngine(model, params, page_size=5)
    with pytest.raises(ValueError, match="never fit"):
        PagedDecodeEngine(model, params, n_pages=2, page_size=4)
