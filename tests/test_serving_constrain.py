"""Grammar-constrained (guided) decoding in the serving engines.

The constraint is a token-id DFA (serving/constrain.py) whose per-state
0/-1e9 mask rides the slot's logit-bias row: constrained, unconstrained,
and differently-constrained requests share one fixed-shape batched step.
Pinned here: outputs follow the automaton exactly (choices / token_set /
forced EOS), unconstrained co-batched streams are untouched, user
logit_bias composes with the mask, the paged engine's preemption replays
the DFA state exactly, and invalid automata are rejected at submit.

Beyond-reference capability (the reference has no generation at all,
SURVEY §0; its GPT stops at teacher-forced logits,
``mop/models/gpt_mop.py:181-207``).
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import (TransformerConfig, create_gpt_baseline,
                            create_gpt_quartet, generate_cached)
from mop_tpu.serving import (DecodeEngine, PagedDecodeEngine,
                             SpecDecodeEngine, TokenDFA, choices, token_set)
from mop_tpu.serving.constrain import mask_row

EOS = 0


def _setup(use_quartet=True, block=32, vocab=50):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=block)
    mk = create_gpt_quartet if use_quartet else create_gpt_baseline
    model = mk(vocab, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


# ---------------- automaton unit tests ----------------

def test_choices_trie_merges_shared_prefixes():
    dfa = choices([[3, 4, 5], [3, 4, 9], [7]])
    s = dfa.init_state()
    assert sorted(dfa.allowed(s)) == [3, 7]
    s34 = dfa.advance(dfa.advance(s, 3), 4)
    assert sorted(dfa.allowed(s34)) == [5, 9]
    assert dfa.accepts(dfa.advance(s34, 5))
    assert dfa.accepts(dfa.advance(s, 7))
    assert not dfa.accepts(s34)
    assert dfa.advance(s, 4) is None  # not a legal first token


def test_token_set_length_bounds():
    dfa = token_set([2, 3], min_len=2, max_len=3)
    s = dfa.init_state()
    assert not dfa.accepts(s)
    s1 = dfa.advance(s, 2)
    assert not dfa.accepts(s1)
    s2 = dfa.advance(s1, 3)
    assert dfa.accepts(s2)
    s3 = dfa.advance(s2, 2)
    assert dfa.accepts(s3) and not dfa.allowed(s3)  # max_len: EOS forced
    # unbounded: the terminal state self-loops and accepts
    dfa_u = token_set([2, 3], min_len=1)
    su = dfa_u.advance(dfa_u.init_state(), 2)
    assert dfa_u.accepts(su) and dfa_u.advance(su, 3) == su


def test_dead_end_automata_rejected():
    with pytest.raises(ValueError, match="dead-end"):
        TokenDFA({0: {5: 1}}, 0, accept=[])  # state 1 dead-ends
    with pytest.raises(ValueError, match="at least one"):
        choices([])
    with pytest.raises(ValueError, match="empty"):
        choices([[]])
    with pytest.raises(ValueError, match="at least one"):
        token_set([])
    with pytest.raises(ValueError, match="bounds"):
        token_set([2], min_len=3, max_len=2)


def test_mask_row_semantics():
    dfa = choices([[3, 4]])
    s0 = dfa.init_state()
    row = mask_row(dfa, s0, vocab=10, eos_id=EOS)
    assert row[3] == 0.0 and row[EOS] == -np.inf  # non-accepting: EOS banned
    assert (row != 0).sum() == 9
    send = dfa.advance(dfa.advance(s0, 3), 4)
    row = mask_row(dfa, send, vocab=10, eos_id=EOS)
    assert row[EOS] == 0.0 and (row == 0).sum() == 1  # EOS forced
    with pytest.raises(ValueError, match="outside vocab"):
        mask_row(choices([[99]]), (), vocab=10, eos_id=EOS)


# ---------------- engine behavior ----------------

def test_single_choice_is_forced_exactly():
    """A one-sequence choices() DFA leaves the model no freedom: the
    output must be exactly that sequence + EOS, whatever the logits."""
    model, params = _setup()
    want = [9, 31, 7, 7, 2]
    eng = DecodeEngine(model, params, max_batch=4, eos_id=EOS)
    rid = eng.submit([5, 17, 3], 20, constraint=choices([want]))
    res = eng.run()
    assert res[rid] == want + [EOS]


@pytest.mark.parametrize("use_quartet", [True, False])
def test_choices_and_cobatched_unconstrained(use_quartet):
    """A guided-choice request picks ONE full choice then EOS, while an
    unconstrained request in the same batch emits exactly its solo
    ``generate_cached`` stream (the mask is per-row)."""
    model, params = _setup(use_quartet)
    opts = [[9, 31, 7], [9, 14], [40, 41, 42, 43]]
    free_prompt = [7, 8, 9, 10]
    eng = DecodeEngine(model, params, max_batch=4, eos_id=EOS)
    rc = eng.submit([5, 17, 3], 20, constraint=choices(opts))
    rf = eng.submit(free_prompt, 12, eos_id=-1)
    res = eng.run()
    got = res[rc]
    assert got[-1] == EOS and got[:-1] in opts
    solo = generate_cached(model, params,
                           jnp.asarray(free_prompt, jnp.int32)[None],
                           max_new_tokens=12)
    assert res[rf] == np.asarray(solo)[0, len(free_prompt):].tolist()


def test_token_set_bounds_respected_greedy_and_sampled():
    model, params = _setup()
    allowed = [10, 11, 12, 13]
    eng = DecodeEngine(model, params, max_batch=4, eos_id=EOS,
                       rng=jax.random.PRNGKey(7))
    dfa = token_set(allowed, min_len=2, max_len=5)
    r_g = eng.submit([5, 17, 3], 20, constraint=dfa)
    r_s = eng.submit([1, 2, 3, 4], 20, temperature=1.5, top_k=8,
                     constraint=dfa)
    res = eng.run()
    for rid in (r_g, r_s):
        toks = res[rid]
        assert toks[-1] == EOS
        body = toks[:-1]
        assert 2 <= len(body) <= 5
        assert set(body) <= set(allowed)


def test_constraint_composes_with_user_logit_bias():
    """Inside the allowed set the user's logit_bias still steers: a huge
    bias on one allowed token forces it at every constrained position."""
    model, params = _setup()
    dfa = token_set([10, 11, 12], min_len=3, max_len=3)
    eng = DecodeEngine(model, params, max_batch=2, eos_id=EOS)
    rid = eng.submit([5, 17, 3], 20, constraint=dfa,
                     logit_bias={11: 1e6, 44: 1e9})  # 44 is banned anyway
    res = eng.run()
    assert res[rid] == [11, 11, 11, EOS]


def test_budget_truncates_unfinished_constraint():
    """max_new_tokens below the shortest legal completion truncates (same
    contract as unconstrained decoding); the emitted prefix is DFA-legal."""
    model, params = _setup()
    dfa = token_set([10, 11], min_len=6, max_len=6)
    eng = DecodeEngine(model, params, max_batch=2, eos_id=EOS)
    rid = eng.submit([5, 17, 3], 4, constraint=dfa)
    res = eng.run()
    assert len(res[rid]) == 4 and set(res[rid]) <= {10, 11}
    assert eng.is_done(rid)


def test_submit_validation():
    model, params = _setup(vocab=50)
    eng = DecodeEngine(model, params, max_batch=2)  # no engine eos
    dfa = choices([[3, 4]])
    with pytest.raises(ValueError, match="eos_id"):
        eng.submit([1, 2], 8, constraint=dfa)
    with pytest.raises(ValueError, match="outside vocab"):
        eng.submit([1, 2], 8, eos_id=EOS, constraint=choices([[60]]))
    with pytest.raises(ValueError, match="transition token"):
        eng.submit([1, 2], 8, eos_id=3, constraint=choices([[3, 4]]))


def test_spec_engine_rejects_constraint():
    model, params = _setup()
    eng = SpecDecodeEngine(model, params, model, params, max_batch=2,
                           eos_id=EOS)
    with pytest.raises(ValueError, match="constraint"):
        eng.submit([1, 2, 3], 8, constraint=choices([[4, 5]]))


def test_paged_constraint_survives_preemption():
    """Forced preemption mid-constraint: the re-admitted request replays
    its DFA state over the already-emitted tokens and finishes with
    EXACTLY the dense engine's constrained stream."""
    model, params = _setup(block=32)
    dfa = token_set([10, 11, 12, 13], min_len=10, max_len=14)
    jobs = [([5, 17, 3, 41, 2, 9, 11, 4], 16), ([1, 2, 3, 4, 5, 6, 7, 8], 16)]
    dense = DecodeEngine(model, params, max_batch=2, eos_id=EOS)
    d_rids = [dense.submit(p, n, constraint=dfa) for p, n in jobs]
    want = [dense.run()[r] for r in d_rids]
    eng = PagedDecodeEngine(model, params, max_batch=2, n_pages=9,
                            page_size=4, eos_id=EOS)
    rids = [eng.submit(p, n, constraint=dfa) for p, n in jobs]
    res = eng.run()
    assert eng.preemptions > 0
    assert [res[r] for r in rids] == want
    for toks in want:
        body = toks[:-1] if toks[-1] == EOS else toks
        assert set(body) <= {10, 11, 12, 13}
