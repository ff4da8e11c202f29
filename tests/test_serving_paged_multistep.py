"""Multi-step decoding on the PAGED engine + per-slot burst fallback.

Round-5 serving contract (VERDICT r4 items 2/ADVICE 4):

* ``PagedDecodeEngine.step(n_tokens=k)`` runs up to k paged decode steps
  in ONE dispatch, token-identical to k single steps, with every page
  the burst writes pre-allocated (the free pool bounds k; preemption
  never happens inside a burst).
* Burst degradation is PER-SLOT, not per-pool: a constrained or
  short-budget co-tenant no longer collapses every other request's
  burst to k=1 — it sits out (constrained) or retires mid-burst
  (budget/window) while unconstrained co-tenants keep their k.

The reference has no serving stack (SURVEY §0); the baseline here is
our own single-step engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_mop_causal, \
    create_gpt_quartet
from mop_tpu.serving import DecodeEngine
from mop_tpu.serving.paged import PagedDecodeEngine

VOCAB = 47


def _mk(block=64, mop=False):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=block, use_quartet=not mop)
    maker = create_gpt_mop_causal if mop else create_gpt_quartet
    model = maker(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


JOBS = [
    (dict(prompt=[5, 17, 3], max_new_tokens=21), {}),
    (dict(prompt=[9, 8, 7, 6], max_new_tokens=13),
     dict(temperature=0.9, seed=42)),
    (dict(prompt=[1, 4], max_new_tokens=17),
     dict(temperature=0.7, top_k=12, seed=7, repetition_penalty=1.3)),
]


def _serve_paged(model, params, n_tokens, jobs=JOBS, n_pages=24,
                 page_size=8, max_batch=4, **ekw):
    eng = PagedDecodeEngine(model, params, max_batch=max_batch,
                            n_pages=n_pages, page_size=page_size, **ekw)
    rids = [eng.submit(**j, **kw) for j, kw in jobs]
    out = eng.run(n_tokens=n_tokens)
    return [out[r] for r in rids], eng


@pytest.mark.parametrize("mop", [False, True])
@pytest.mark.parametrize("k", [4, 8, 64])
def test_paged_multistep_equals_single_step(mop, k):
    """Greedy + seeded-sampled + penalized requests, co-batched on the
    paged engine: burst serving emits the same tokens and amortizes
    dispatches (k larger than any budget just caps)."""
    model, params = _mk(mop=mop)
    ref, _ = _serve_paged(model, params, 1)
    got, eng = _serve_paged(model, params, k)
    assert got == ref
    assert eng.engine_steps < sum(j["max_new_tokens"] for j, _ in JOBS)


def test_paged_multistep_under_pool_pressure():
    """A pool too small to co-host every request: bursts shrink to what
    the free pages cover (or fall back to preempting single steps) and
    greedy tokens still match the single-step run exactly."""
    model, params = _mk(block=32)
    jobs = [(dict(prompt=[5, 17, 3], max_new_tokens=20), {}),
            (dict(prompt=[9, 8, 7, 6], max_new_tokens=20), {}),
            (dict(prompt=[1, 4], max_new_tokens=20), {})]
    # pages_per_slot = 32/8 = 4; 5 pages can't host three 20-token
    # requests resident at once -> growth stalls + preemption
    ref, e1 = _serve_paged(model, params, 1, jobs=jobs, n_pages=5,
                           page_size=8, max_batch=3)
    got, e8 = _serve_paged(model, params, 8, jobs=jobs, n_pages=5,
                           page_size=8, max_batch=3)
    assert got == ref
    # the tight pool really was exercised
    assert e1.preemptions > 0 or e1.peak_pages_in_use == 5


def test_paged_multistep_eos_mid_burst():
    model, params = _mk()
    ref, _ = _serve_paged(model, params, 1)
    eos_tok = ref[0][5]
    jobs = [(dict(prompt=[5, 17, 3], max_new_tokens=21,
                  eos_id=int(eos_tok)), {}),
            (dict(prompt=[9, 8, 7, 6], max_new_tokens=13), {})]
    r1, _ = _serve_paged(model, params, 1, jobs=jobs)
    r8, _ = _serve_paged(model, params, 8, jobs=jobs)
    assert r8 == r1
    assert len(r8[0]) < 21 and r8[0][-1] == int(eos_tok)


def test_paged_multistep_logprobs_stay_aligned():
    model, params = _mk()
    ref, eng1 = _serve_paged(model, params, 1, logprobs_topk=2)
    got, eng8 = _serve_paged(model, params, 8, logprobs_topk=2)
    assert got == ref
    for rid in eng1.results:
        assert len(eng8.logprobs[rid]) == len(eng8.results[rid])
        np.testing.assert_allclose(eng8.logprobs[rid],
                                   eng1.logprobs[rid], atol=1e-5)


# ---------------- per-slot burst fallback (dense + paged) ----------------

def test_constrained_cotenant_keeps_cobatched_burst():
    """One constrained request must NOT collapse co-batched
    unconstrained streams to single-stepping: with burst k the step
    count stays ~budget/k, the constrained output still satisfies its
    DFA, and the unconstrained stream matches its solo run."""
    from mop_tpu.serving.constrain import choices

    model, params = _mk()
    eos = VOCAB - 1
    N = 32

    def serve(with_constraint):
        eng = DecodeEngine(model, params, max_batch=2, eos_id=eos)
        rids = [eng.submit([9, 8, 7], max_new_tokens=N)]
        if with_constraint:
            rids.append(eng.submit([5, 1], max_new_tokens=8,
                                   constraint=choices([[4, 2],
                                                       [4, 9, 9]])))
        out = eng.run(n_tokens=8)
        return [out[r] for r in rids], eng

    (solo_toks,), solo = serve(False)
    (got_toks, con_toks), eng = serve(True)
    assert got_toks == solo_toks          # co-tenancy changed nothing
    assert con_toks in ([4, 2, eos], [4, 9, 9, eos])
    # dispatch pinning: the constrained co-tenant may add at most its
    # own few single steps on top of the solo burst schedule — nowhere
    # near the N single steps a global k=1 fallback would cost
    assert solo.engine_steps <= N // 8 + 3
    assert eng.engine_steps <= solo.engine_steps + 2


def test_short_budget_cotenant_keeps_cobatched_burst():
    """ADVICE r4: a row with remaining budget 1 used to pull the whole
    batch's burst down to k=1. Now it retires mid-burst and the long
    row keeps its k."""
    model, params = _mk()
    N = 40
    eng = DecodeEngine(model, params, max_batch=2)
    r_long = eng.submit([9, 8, 7], max_new_tokens=N)
    r_short = eng.submit([5, 1], max_new_tokens=2)
    out = eng.run(n_tokens=8)
    assert len(out[r_long]) == N and len(out[r_short]) == 2
    assert eng.engine_steps <= N // 8 + 3     # not ~N
    solo = DecodeEngine(model, params, max_batch=2)
    sr = solo.submit([9, 8, 7], max_new_tokens=N)
    assert solo.run()[sr] == out[r_long]


def test_paged_constrained_cotenant_keeps_cobatched_burst():
    from mop_tpu.serving.constrain import choices

    model, params = _mk()
    eos = VOCAB - 1
    N = 32
    eng = PagedDecodeEngine(model, params, max_batch=2, n_pages=16,
                            page_size=8, eos_id=eos)
    r_g = eng.submit([9, 8, 7], max_new_tokens=N)
    r_c = eng.submit([5, 1], max_new_tokens=8,
                     constraint=choices([[4, 2], [4, 9, 9]]))
    out = eng.run(n_tokens=8)
    assert out[r_c] in ([4, 2, eos], [4, 9, 9, eos])
    solo = PagedDecodeEngine(model, params, max_batch=2, n_pages=16,
                             page_size=8, eos_id=eos)
    sr = solo.submit([9, 8, 7], max_new_tokens=N)
    assert solo.run(n_tokens=8)[sr] == out[r_g]
    assert eng.engine_steps <= N // 8 + 5


def test_chunked_cotenant_bursts():
    """A chunk-pending prompt no longer forces k=1 globally: it is held
    by the burst's elig mask while the live row bursts, its prefill
    still lands correctly, and all outputs match single-step serving."""
    model, params = _mk()
    long_prompt = list(np.arange(30) % (VOCAB - 2) + 1)
    jobs = [(dict(prompt=[5, 17, 3], max_new_tokens=24), {}),
            (dict(prompt=long_prompt, max_new_tokens=9), {})]

    def serve(n_tokens):
        eng = DecodeEngine(model, params, max_batch=2,
                           rng=jax.random.PRNGKey(7), chunk_prefill=8)
        rids = [eng.submit(**j, **kw) for j, kw in jobs]
        out = eng.run(n_tokens=n_tokens)
        return [out[r] for r in rids], eng

    ref, _ = serve(1)
    got, eng = serve(8)
    assert got == ref
    assert eng.engine_steps < 24          # the live row really burst
