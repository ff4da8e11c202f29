"""Teacher-forced prompt scoring (OpenAI ``echo`` + ``logprobs``).

``prompt_logprobs`` returns, for each prompt token, the log-probability
the DECODER assigns it under incremental-decode semantics: one
:func:`~mop_tpu.serving.engine.decode_chunk_rows` pass from an empty
cache, which is EXACTLY the composition of per-token
``decode_step_rows`` calls (each position's score rows standardize over
its own live prefix; pinned against that composition in
tests/test_echo_logprobs.py). Two near-identical alternatives exist and
differ at the 1e-3 level on early positions: the teacher-forced training
forward (quartet standardization sees all T columns pre-mask, reference
quartet_attn_patch.py:95-116) and per-prefix ``prefill`` re-runs (every
row re-standardized over the query prefix, O(T) dispatches). The
incremental-decode choice is the one consistent with how the engine
scores the tokens it generates — echoed-prompt and completion logprobs
sit on one scale.

One forward: the prompt feeds :func:`~mop_tpu.serving.engine.
decode_chunk_rows` on an empty B=1 cache (each position attends over its
own live prefix), log-softmax, gather the next token's logprob + top-k
alternatives on device — the host fetch is O(T·k), never the (T, vocab)
logit slab. Padded to power-of-two widths so the jit cache stays at a
few entries.

The reference has no scoring/serving surface (SURVEY §0).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from collections import OrderedDict

from ..models.generate import init_decode_cache

_CACHE: "OrderedDict" = OrderedDict()
_CACHE_MAX = 16  # LRU bound: each entry pins a model + jitted closure


def _fn(model, t_pad: int, k: int):
    # flax modules aren't reliably hashable -> key on id(model), holding
    # the model strongly in the entry so its id can't be recycled while
    # the cached jit exists (the id(mesh) pitfall from ADVICE r2)
    key = (id(model), t_pad, k)
    if key in _CACHE:
        if _CACHE[key][0] is model:
            _CACHE.move_to_end(key)
            return _CACHE[key][1]
        del _CACHE[key]  # stale: the id was recycled by a new object
    from .engine import decode_chunk_rows  # circular-import guard

    def run(params, tail):
        from ..models.generate import model_n_views
        cache = init_decode_cache(model.config, 1,
                                  n_views=model_n_views(model))
        cache_lens = jnp.zeros((1,), jnp.int32)
        logits, _ = decode_chunk_rows(model, params, cache, tail,
                                      cache_lens)
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), -1)
        # position j-1's distribution scores prompt token j
        chosen = jnp.take_along_axis(
            logp[:-1], tail[0, 1:][:, None], 1)[:, 0]      # (T_pad-1,)
        tv, ti = jax.lax.top_k(logp[:-1], k)               # (T_pad-1, k)
        return chosen, tv, ti

    while len(_CACHE) >= _CACHE_MAX:
        _CACHE.popitem(last=False)
    _CACHE[key] = (model, jax.jit(run))
    return _CACHE[key][1]


def prompt_logprobs(model, params, prompt_ids, n_top: int = 0
                    ) -> Tuple[List[Optional[float]], List[list]]:
    """Score ``prompt_ids`` under the model's decode (prefix) semantics.

    Returns ``(lps, tops)``, each of length ``len(prompt_ids)``:
    ``lps[0] is None`` and ``tops[0] == []`` (nothing conditions the
    first token — the upstream echo convention); ``lps[j]`` is
    ``log P(prompt[j] | prompt[:j])``; ``tops[j]`` lists the ``n_top``
    most likely ``(token_id, logprob)`` alternatives at that position.
    """
    t0 = len(prompt_ids)
    if t0 < 1:
        raise ValueError("empty prompt")
    if t0 > model.config.block_size:
        raise ValueError(
            f"prompt length {t0} exceeds the context window "
            f"({model.config.block_size})")
    t_pad = 8
    while t_pad < t0:
        t_pad *= 2
    t_pad = min(t_pad, model.config.block_size)
    tail = np.zeros((1, t_pad), np.int32)
    tail[0, :t0] = np.asarray(prompt_ids, np.int32)
    chosen, tv, ti = _fn(model, t_pad, max(n_top, 1))(
        params, jnp.asarray(tail))
    chosen, tv, ti = jax.device_get((chosen, tv, ti))
    lps: List[Optional[float]] = [None]
    tops: List[list] = [[]]
    for j in range(1, t0):
        lps.append(float(chosen[j - 1]))
        tops.append([(int(t), float(v))
                     for t, v in zip(ti[j - 1], tv[j - 1])][:n_top])
    return lps, tops
