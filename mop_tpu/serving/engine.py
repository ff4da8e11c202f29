"""Continuous-batching decode engine for the GPT family.

Serving on TPU wants one fixed-shape jitted step that advances EVERY live
request by one token per call — requests at different positions, admitted
and retired independently while the batch keeps running (continuous
batching, vLLM-style, built for XLA's static shapes):

- the KV cache is a fixed pool of ``max_batch`` slots
  (``init_decode_cache`` layout, (L, B, H, block, dk));
- each slot has its own length; the batched decode step writes each row's
  new K/K2/V at its own position (scatter) and masks/standardizes each
  score row over that row's own live prefix (the per-row generalization of
  ``generate_cached``'s math — same values per row, pinned by
  tests/test_serving.py equality vs the single-stream sampler);
- admission = a B=1 dense prefill pasted into a free slot (one compile per
  distinct prompt length, cached by jit); retirement frees the slot for
  the next queued request without touching the other rows.

Host-side control (admission, retirement, EOS) runs between device steps —
the per-token device work is one fixed-shape jit call regardless of how
many requests are in flight. Accepts int8-quantized params
(``mop_tpu.ops.quant.quantize_params``) like the rest of the decode stack.

The reference has no serving/inference loop at all (SURVEY §0; its GPT
stops at teacher-forced logits, ``mop/models/gpt_mop.py:181-207``).
Covers TinyTransformerLM (base + quartet) AND GPT_MoP: the namesake
model's per-block gate state (a per-layer view history ``mv``) rides the
same slot pool as the KV rows. The ``create_gpt_mop_causal`` variant
(left-padded gate convs + causal-prefix score standardization) serves
EXACTLY — engine tokens equal its full-window sampler's; the
reference-exact non-causal variant serves under the documented frontier
approximation (``models.generate._mop_taps``; divergence measured in
benchmarks/decode.md).
"""

from __future__ import annotations

from collections import OrderedDict, deque
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.generate import (_attn_step, _kv_rows, _lin, _ln, _mop_gates,
                               init_decode_cache, model_n_views, prefill,
                               prefill_padded)
from ..models.layers import gelu_tanh
from .constrain import mask_row

Array = jax.Array


def lora_params_view(params, rows):
    """Params view with per-row LoRA factors inserted beside each adapted
    kernel (read by ``_lin``). ``rows``: {kernel-path: (a, b)} where the
    path is the slash-joined param path of ``mop_tpu.training.lora`` (e.g.
    ``params/blocks_0/attn/q_proj/kernel``), ``a`` is (B, din, r) and ``b``
    (B, r, dout) — row i holds batch row i's adapter factors (zeros = no
    adapter). Shallow-copies only the dicts along each path; every leaf
    array is shared with ``params``."""
    def set_parent(tree, parts, a, b):
        node = dict(tree)
        if len(parts) == 1:  # parts[0] is the kernel key; insert siblings
            node["lora_a"] = a
            node["lora_b"] = b
            return node
        node[parts[0]] = set_parent(node[parts[0]], parts[1:], a, b)
        return node

    for path, (a, b) in rows.items():
        params = set_parent(params, path.split("/"), a, b)
    return params


def decode_step_rows(model, params, cache, tokens, lens):
    """Advance every row one token, each at its OWN position.

    tokens: (B,) int32 — each row's current token (appended this step).
    lens:   (B,) int32 — each row's live length BEFORE the append.
    Returns (logits (B, vocab), new_cache) where new k/k2/v rows were
    scatter-written at each row's ``lens`` position and ``cache['len']``
    holds the per-row lengths after the append.

    Rows are independent: row b's output depends only on row b's tokens —
    the engine relies on this to mix unrelated requests in one batch
    (pinned against ``generate_cached`` in tests/test_serving.py).
    """
    cfg = model.config
    p = params["params"]
    b = tokens.shape[0]
    rows = jnp.arange(b)
    n_valid = lens + 1
    x = p["wte"]["embedding"][tokens][:, None, :]  # (B, 1, C)
    if cfg.use_abs_pos_emb:
        x = x + p["wpe"]["embedding"][lens][:, None, :]

    new_cache = dict(cache)
    for i in range(cfg.n_layer):
        bp = p[f"blocks_{i}"]
        h = _ln(x, bp["ln1"])
        k_new, k2_new, v_new = _kv_rows(bp["attn"], cfg, h)  # (B, H, 1, dk)
        # Per-row scatter: row b's new K/V lands at (i, b, :, lens[b], :).
        wr = lambda buf, row: buf.at[i, rows, :, lens, :].set(
            row[:, :, 0, :].astype(buf.dtype))
        new_cache["k"] = wr(new_cache["k"], k_new)
        new_cache["k2"] = wr(new_cache["k2"], k2_new)
        new_cache["v"] = wr(new_cache["v"], v_new)
        a = _attn_step(bp["attn"], cfg, h, new_cache["k"][i],
                       new_cache["k2"][i], new_cache["v"][i], n_valid)
        x = x + a
        if "views" in bp:  # GPT_MoP: gate between attention and MLP, each
            # row's conv taps read its OWN view history at its own position
            v_row = _lin(x, bp["views"]["proj"])  # (B, 1, V)
            new_cache["mv"] = new_cache["mv"].at[i, rows, lens, :].set(
                v_row[:, 0, :].astype(new_cache["mv"].dtype))
            gate = _mop_gates(bp, new_cache["mv"][i], lens,
                              bool(getattr(model, "causal_gate", False)))
            x = x * gate[..., None]
        hm = _ln(x, bp["ln2"])
        x = x + _lin(gelu_tanh(_lin(hm, bp["mlp"]["fc"])), bp["mlp"]["proj"])

    x = _ln(x, p["ln_f"])
    logits = (x @ p["wte"]["embedding"].T)[:, 0, :]
    new_cache["len"] = n_valid
    return logits, new_cache


def decode_chunk_rows(model, params, cache, tokens, lens):
    """Advance every row G tokens, each at its OWN position.

    tokens: (B, G) int32 — G consecutive tokens per row, appended starting
    at that row's ``lens``. Returns (logits (B, G, vocab), new_cache) with
    row b's new K/K2/V rows written at ``lens[b] .. lens[b]+G-1`` and
    ``cache['len'] = lens + G``.

    The per-row generalization of :func:`mop_tpu.models.generate.decode_chunk`
    (row b, chunk position g standardizes/attends over the
    ``lens[b]+g+1``-column live prefix) and exactly the composition of G
    :func:`decode_step_rows` calls — the verify pass of speculative
    continuous batching (pinned in tests/test_serving_speculative.py).
    """
    cfg = model.config
    p = params["params"]
    b, g = tokens.shape
    h = cfg.n_head
    c = cfg.n_embd
    dk = c // h
    rows = jnp.arange(b)
    pos = lens[:, None] + jnp.arange(g)[None, :]  # (B, G)
    x = p["wte"]["embedding"][tokens]
    if cfg.use_abs_pos_emb:
        x = x + p["wpe"]["embedding"][pos]

    block = cache["k"].shape[3]
    nv = pos + 1  # (B, G) per-row per-position valid-prefix lengths
    cols4 = (jnp.arange(block)[None, None, :] < nv[:, :, None])[:, None]
    nvf = nv.astype(jnp.float32)[:, None, :, None]

    def std(s, eps):
        mu = jnp.sum(jnp.where(cols4, s, 0.0), -1, keepdims=True) / nvf
        var = jnp.sum(jnp.where(cols4, jnp.square(s - mu), 0.0), -1,
                      keepdims=True) / jnp.maximum(nvf - 1.0, 1.0)
        return (s - mu) / (jnp.sqrt(var) + eps)

    split = lambda y: y.reshape(b, g, h, dk).transpose(0, 2, 1, 3)
    scale = 1.0 / jnp.sqrt(dk).astype(jnp.float32)
    new_cache = dict(cache)
    for i in range(cfg.n_layer):
        bp = p[f"blocks_{i}"]
        hx = _ln(x, bp["ln1"])
        ap = bp["attn"]
        q = split(_lin(hx, ap["q_proj"]))
        k_new = split(_lin(hx, ap["k_proj"]))
        v_new = split(_lin(hx, ap["v_proj"]))
        k2_new = split(_lin(hx, ap["k2_proj"])) if cfg.use_quartet else k_new
        # row b's G new rows land at (i, b, :, pos[b], :)
        wr = lambda buf, r: buf.at[i, rows[:, None], :, pos, :].set(
            r.transpose(0, 2, 1, 3).astype(buf.dtype))
        new_cache["k"] = wr(new_cache["k"], k_new)
        new_cache["k2"] = wr(new_cache["k2"], k2_new)
        new_cache["v"] = wr(new_cache["v"], v_new)
        qk = jnp.einsum("bhqd,bhkd->bhqk", q, new_cache["k"][i]) * scale
        if cfg.use_quartet:
            q2 = split(_lin(hx, ap["q2_proj"]))
            q2k2 = jnp.einsum(
                "bhqd,bhkd->bhqk", q2, new_cache["k2"][i]) * scale
            m = jax.nn.sigmoid(ap["mixture"][0])
            s1 = std(qk, cfg.score_norm_eps)
            s2 = std(q2k2, cfg.score_norm_eps)
            scores = (1.0 - m) * s1 + m * (s1 * s2) * ap["quartet_scale"][0]
        else:
            scores = std(qk, 1e-5)  # non-quartet hardcodes 1e-5
        scores = jnp.where(cols4, scores, -jnp.inf)
        att = jax.nn.softmax(scores, axis=-1)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, new_cache["v"][i])
        y = y.transpose(0, 2, 1, 3).reshape(b, g, c)
        x = x + _lin(y, ap["o_proj"])
        if "views" in bp:  # GPT_MoP gate, per row per chunk position
            v_rows = _lin(x, bp["views"]["proj"])  # (B, G, V)
            new_cache["mv"] = new_cache["mv"].at[
                i, rows[:, None], pos, :].set(
                v_rows.astype(new_cache["mv"].dtype))
            gate = _mop_gates(bp, new_cache["mv"][i], pos,
                              bool(getattr(model, "causal_gate", False)))
            x = x * gate[..., None]
        hm = _ln(x, bp["ln2"])
        x = x + _lin(gelu_tanh(_lin(hm, bp["mlp"]["fc"])), bp["mlp"]["proj"])

    x = _ln(x, p["ln_f"])
    logits = x @ p["wte"]["embedding"].T  # (B, G, vocab)
    new_cache["len"] = lens + g
    return logits, new_cache


class DecodeEngine:
    """Continuous-batching greedy/sampled decode over a fixed slot pool.

    >>> eng = DecodeEngine(model, params, max_batch=8)
    >>> rid = eng.submit([5, 17, 3], max_new_tokens=32)
    >>> results = eng.run()          # {rid: [tokens...]}

    ``submit`` may be called at any time (including between ``step`` calls
    while other requests are mid-flight). ``step`` advances all live
    requests one token and returns ``{rid: token}`` for this step's
    emissions. ``run`` steps until queue and slots drain.
    """

    def __init__(self, model, params, max_batch: int = 8,
                 eos_id: Optional[int] = None, temperature: float = 0.0,
                 top_k: Optional[int] = None, top_p: Optional[float] = None,
                 rng: Optional[Array] = None,
                 cache_sharding=None,
                 prefill_buckets: Optional[Sequence[int]] = None,
                 prefix_cache_entries: int = 0,
                 kv_dtype=jnp.float32,
                 min_p: float = 0.0, repetition_penalty: float = 1.0,
                 presence_penalty: float = 0.0,
                 frequency_penalty: float = 0.0,
                 adapters: Optional[Dict[str, dict]] = None,
                 adapter_scale=1.0,
                 chunk_prefill: Optional[int] = None,
                 logprobs_topk: int = 0,
                 max_beams: int = 0):
        """``cache_sharding``: optional ``jax.sharding.NamedSharding`` for
        the K/K2/V slot pools — e.g. heads over the mesh 'model' axis,
        ``NamedSharding(mesh, P(None, None, 'model', None, None))`` — for
        tensor-parallel serving with ``tp_shard_params``-sharded params
        (tests/test_serving_tp.py). Params sharded over a mesh work with or
        without this: the jitted step is GSPMD-partitioned either way.

        ``prefill_buckets``: optional ascending pad lengths (e.g. ``[16,
        64, 256]``). Admission pads each prompt to the smallest bucket and
        runs the length-masked exact prefill (``prefill_padded``), so jit
        compiles once per bucket instead of once per distinct prompt
        length; prompts longer than the last bucket fall back to the exact
        per-length prefill. Emitted tokens are unchanged (pad columns are
        masked out of the row statistics; tests/test_serving.py).

        ``kv_dtype``: storage dtype of the K/K2/V slot pools (compute stays
        fp32). ``jnp.bfloat16`` halves cache HBM and per-step KV reads;
        divergence is measured in benchmarks/decode.md.

        ``adapters``: optional ``{name: adapter_dict}`` bank of LoRA
        adapters (``mop_tpu.training.lora`` format, all sharing one path
        set and rank). A request picks its adapter by name at
        ``submit(..., adapter=...)`` (None = the base model) and requests
        with DIFFERENT adapters batch into the same fixed-shape decode
        step: the step consumes per-row rank-r factor stacks gathered from
        the bank at admission (multi-LoRA serving — the merge-based
        ``lora_merge`` path would force one batch per adapter).
        ``adapter_scale``: float or ``{name: float}``, the merge scale
        (alpha/r), folded into the bank's B factors.

        ``prefix_cache_entries``: if > 0, keep an LRU of that many recent
        prompts' K/K2/V rows; a new prompt sharing a prefix with a cached
        one reuses the shared rows and runs ``decode_chunk_rows`` over
        only the tail (EXACT — a position's K/K2/V and row statistics
        depend only on the tokens at or before it, so shared-prefix rows
        are identical whatever follows; equality pinned in
        tests/test_serving_prefix.py). Wins when requests share a long
        system prompt; stats in ``prefix_cache_hits`` /
        ``prefix_tokens_reused``.

        ``chunk_prefill``: if set (a chunk size C <= block_size), a prompt
        longer than C is prefilled INCREMENTALLY — one C-token chunk per
        engine step (``decode_chunk_rows``, exact length-masked math) —
        instead of one monolithic prefill dispatch at admission. Per-step
        device work is then bounded by C whatever the prompt length, so
        co-batched decode streams keep emitting a token every step while a
        long prompt ramps in (the Sarathi/vLLM chunked-prefill property;
        tail-latency bound). Emitted tokens are unchanged (equality vs the
        monolithic admission pinned in tests/test_serving_chunked.py), and
        one chunk shape means ONE jit compile for every prompt length.
        Composes with the prefix cache (only the uncached tail is
        chunked).

        ``max_beams``: if > 0, requests may ask for per-request BEAM
        SEARCH (``submit(..., num_beams=k)``, 2 <= k <= max_beams). A
        beam request occupies k adjacent rows of the SAME fixed-shape
        step (beams are just rows with shared prefixes); after each step
        the host selects the top k of the k x k candidate expansions
        (exact — each parent's k best bound the global top k) and one
        extra device dispatch permutes the group's cache rows by parent
        beam. Beam requests co-batch with greedy/sampled requests and
        their tokens equal ``models.beam.generate_beam`` single-stream
        token-for-token (tests/test_serving_beam.py). The step returns
        a (B, max_beams) top-logprob block every iteration — keep
        max_beams modest.

        ``logprobs_topk``: if > 0, every emitted token's log-probability
        plus the ``logprobs_topk`` most likely alternatives are recorded
        (``logprobs`` / ``top_logprobs``, aligned 1:1 with ``results``).
        Logprobs are the MODEL's distribution — fp32 log-softmax of the
        raw logits, before temperature, penalties, logit bias, or
        constraint masks (the OpenAI semantics: what the model believed,
        not what the sampler did). Costs one (B, vocab) log-softmax +
        top-k per step — negligible next to the decode matmuls — and is
        off by default so untracked engines are byte-identical."""
        self.model = model
        self.params = params
        self.max_batch = max_batch
        self.eos_id = eos_id
        if not 0 <= int(logprobs_topk) <= 32:
            raise ValueError(
                f"logprobs_topk must be in [0, 32], got {logprobs_topk}")
        self.logprobs_topk = int(logprobs_topk)
        if not 0 <= int(max_beams) <= max_batch:
            raise ValueError(
                f"max_beams must be in [0, max_batch={max_batch}], got "
                f"{max_beams}")
        self.max_beams = int(max_beams)
        # live beam groups: rid -> {slots, k, scores, alive, hyp_len,
        # bufs, lenpen, budget, eos} (host-side hypothesis sets)
        self._beam_groups: Dict[int, dict] = {}
        self._beam_finalized: List[tuple] = []
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self.min_p = min_p
        self.repetition_penalty = repetition_penalty
        self.presence_penalty = presence_penalty
        self.frequency_penalty = frequency_penalty
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        cfg = model.config
        self.block_size = cfg.block_size
        if kv_dtype == jnp.int8:
            raise ValueError(
                "the serving engines support fp32/bfloat16 KV pools; the "
                "int8 per-row-scale layout is a generate_cached feature")
        self.kv_dtype = kv_dtype
        # GPT_MoP models carry a per-layer view history ``mv`` beside the
        # K/K2/V pools; every pool paste/store/slice below loops over
        # ``_pool_keys`` so the gate state rides the same admission,
        # prefix-cache, and preemption machinery as the KV rows.
        self._n_views = model_n_views(model)
        self._pool_keys = (("k", "k2", "v", "mv") if self._n_views
                           else ("k", "k2", "v"))
        self._cache = self._make_cache(cfg, max_batch, kv_dtype,
                                       cache_sharding)
        self._tokens = jnp.zeros((max_batch,), jnp.int32)
        self._slot_rid: List[int] = [-1] * max_batch
        self._budget = np.zeros((max_batch,), np.int64)
        # per-slot sampling params (set at admission from the request's
        # overrides; the batched picker consumes them as (B,) vectors so
        # requests with different temperature/top_k/top_p/eos share one
        # fixed-shape step)
        self._slot_temp = np.zeros((max_batch,), np.float32)
        self._slot_topk = np.zeros((max_batch,), np.int32)   # 0 = off
        self._slot_topp = np.ones((max_batch,), np.float32)  # 1.0 = off
        self._slot_eos = np.full((max_batch,), -1, np.int64)  # -1 = none
        self._slot_minp = np.zeros((max_batch,), np.float32)  # 0 = off
        self._slot_rep = np.ones((max_batch,), np.float32)    # 1 = off
        self._slot_pres = np.zeros((max_batch,), np.float32)  # 0 = off
        self._slot_freq = np.zeros((max_batch,), np.float32)  # 0 = off
        # per-request seeded sampling: seed >= 0 pins the row's sample
        # stream to fold_in(PRNGKey(seed), n) for its n-th output token —
        # depending only on (seed, position), NOT on batch composition,
        # engine step count, or co-batched traffic, so a seeded request
        # reproduces bit-exactly on any serving schedule (stronger than
        # the OpenAI best-effort `seed`). -1 = unseeded (engine rng).
        self._slot_seed = np.full((max_batch,), -1, np.int64)
        self._slot_ntok = np.zeros((max_batch,), np.int64)
        # per-slot penalty state: output-token counts and prompt-seen masks
        # ((B, vocab) device buffers, threaded through the jitted step so
        # the counts update on-device; rows are re-seeded at admission from
        # the request's prompt + previously emitted tokens)
        self._vocab = model.vocab_size
        self._ocounts = jnp.zeros((max_batch, self._vocab), jnp.int32)
        self._pseen = jnp.zeros((max_batch, self._vocab), bool)
        # per-slot logit bias rows (0 = no effect) + host copies for paged
        # re-admission; per-slot multi-token stop sequences (host-side
        # suffix match in _emit_token)
        self._lbias = jnp.zeros((max_batch, self._vocab), jnp.float32)
        self._slot_bias: List[Optional[np.ndarray]] = [None] * max_batch
        self._slot_stops: List[list] = [[] for _ in range(max_batch)]
        # grammar-constrained decoding: per-slot DFA + current state; the
        # state's 0/-inf token mask is folded into the slot's _lbias row
        # (serving/constrain.py), advanced host-side in _emit_token
        self._slot_constraint: List[Optional[Any]] = [None] * max_batch
        self._slot_cstate: List[Any] = [None] * max_batch
        # multi-LoRA: stacked (N+1, ...) factor banks per adapted kernel
        # path (row 0 = zeros = base model) + per-slot gathered (B, ...)
        # rows the step's params view reads (lora_params_view -> _lin)
        self._lora_bank: Dict[str, tuple] = {}
        self._lora_rows: Dict[str, tuple] = {}
        self._adapter_idx: Dict[Optional[str], int] = {None: 0}
        self._slot_adapter = np.zeros((max_batch,), np.int32)
        if adapters:
            self._init_lora_bank(adapters, adapter_scale, max_batch)
        self._queue: deque = deque()
        self._results: Dict[int, List[int]] = {}
        self._done: Dict[int, bool] = {}
        self._logprobs: Dict[int, List[float]] = {}
        self._top_logprobs: Dict[int, List[list]] = {}
        self._next_rid = 0
        self.tokens_generated = 0
        self.engine_steps = 0

        def _step(params, cache, tokens, lens, rng, seeds, ntoks, temp,
                  topk, topp, minp, rep, pres, freq, ocounts, pseen, lbias,
                  adv):
            """``adv``: (B,) bool — rows that actually advance this step.
            Held rows (chunk-pending prompts, rows that already took a
            multi-step burst this engine iteration) keep their token,
            length, and penalty counts: the step's garbage K/V column at
            a held row's ``lens`` is overwritten by that row's next real
            feed and masked out of every softmax by the held length."""
            logits, new_cache = decode_step_rows(
                self.model, params, cache, tokens, lens)
            nxt = self._pick_rows(logits, rng, temp, topk, topp, minp,
                                  rep, pres, freq, ocounts, pseen, lbias,
                                  seeds=seeds, ntoks=ntoks)
            nxt = jnp.where(adv, nxt, tokens)
            new_cache["len"] = jnp.where(adv, new_cache["len"], lens)
            ocounts = ocounts.at[jnp.arange(ocounts.shape[0]), nxt].add(
                adv.astype(jnp.int32))
            return (nxt, new_cache, ocounts) + self._lp_of(logits, nxt) \
                + self._beam_tops(logits)

        self._step_fn = jax.jit(_step, donate_argnums=(14,))

        def _mstep(params, cache, tokens, rng, seeds, ntoks, temp,
                   topk, topp, minp, rep, pres, freq, ocounts, pseen,
                   lbias, k_steps, elig):
            """k fixed-shape decode steps in ONE dispatch (multi-step
            scheduling): the per-dispatch host/tunnel latency that
            dominates serving tok/s amortizes over k tokens. The rng
            split, picker, penalty-count update, and seeded-stream
            position all advance per inner step exactly as k single
            ``step`` calls would (equality pinned in
            tests/test_serving_multistep.py).

            ``elig``: (B,) bool — rows taking the burst. Ineligible rows
            (inactive slots, chunk-pending prompts, CONSTRAINED requests
            whose DFA mask must update between tokens) are held in place:
            token/length/penalty counts pinned via ``where``, their
            repeated garbage K/V write at the held ``len`` overwritten by
            their next real feed. They advance via a follow-up single
            step (see ``step``) so co-batching with a constrained request
            no longer collapses the whole pool to k=1."""
            b = tokens.shape[0]

            def body(carry, _):
                cache, tokens, rng, ocounts, ntoks = carry
                lens0 = cache["len"]
                logits, cache = decode_step_rows(
                    self.model, params, cache, tokens, lens0)
                cache["len"] = jnp.where(elig, cache["len"], lens0)
                rng, sub = jax.random.split(rng)
                nxt = self._pick_rows(logits, sub, temp, topk, topp,
                                      minp, rep, pres, freq, ocounts,
                                      pseen, lbias, seeds=seeds,
                                      ntoks=ntoks)
                nxt = jnp.where(elig, nxt, tokens)
                ocounts = ocounts.at[jnp.arange(b), nxt].add(
                    elig.astype(jnp.int32))
                out = (nxt,) + self._lp_of(logits, nxt)
                return (cache, nxt, rng, ocounts, ntoks + 1), out

            carry, outs = jax.lax.scan(
                body, (cache, tokens, rng, ocounts, ntoks), None,
                length=k_steps)
            cache, tokens, rng, ocounts, _ = carry
            return (cache, tokens, rng, ocounts) + tuple(outs)

        self._mstep_fn = jax.jit(_mstep, static_argnums=(16,),
                                 donate_argnums=(1,))

        def _beam_apply(c, perm, newtoks):
            """Post-step beam bookkeeping on device: permute the pool
            rows by parent beam (identity outside beam groups; per-row
            lengths are equal within a group, so ``len`` needs no
            gather) and install the host-selected next tokens."""
            c = dict(c)
            for key in self._pool_keys:
                c[key] = jnp.take(c[key], perm, axis=1)
            return c, newtoks

        self._beam_apply_fn = jax.jit(_beam_apply, donate_argnums=(0,))

        def _adm_beam(params, c, tokens, prompt, slots, k_beams):
            """Beam admission: ONE prefill pasted into all k slots plus
            the top-k first tokens/scores (the fan-out step of
            ``models.beam.generate_beam``)."""
            logits, pc = prefill(self.model, params, prompt)
            c = dict(c)
            for key in self._pool_keys:
                c[key] = c[key].at[:, slots].set(
                    pc[key][:, 0][:, None].astype(c[key].dtype))
            c["len"] = c["len"].at[slots].set(prompt.shape[1])
            logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), -1)
            scores, toks = jax.lax.top_k(logp, k_beams)
            tokens = tokens.at[slots].set(toks.astype(jnp.int32))
            return c, tokens, scores, toks.astype(jnp.int32)

        self._adm_beam_fn = jax.jit(_adm_beam, donate_argnums=(1, 2),
                                    static_argnums=(5,))
        self.prefill_buckets = (
            sorted(prefill_buckets) if prefill_buckets else None)
        if self.prefill_buckets and self.prefill_buckets[-1] > self.block_size:
            raise ValueError(
                f"prefill bucket {self.prefill_buckets[-1]} exceeds "
                f"block_size {self.block_size}")
        self._prefix_max = prefix_cache_entries
        self._prefix_lru: "OrderedDict[tuple, dict]" = OrderedDict()
        self.prefix_cache_hits = 0
        self.prefix_tokens_reused = 0

        # Fused single-dispatch admission (see _admit_one): prefill/chunk +
        # pool paste + length/token update + store-row slice in ONE jitted
        # call with donated pool buffers. Per-dispatch latency dominates
        # admission cost on a remote/tunneled device, and donation lets XLA
        # update the (L, B, H, block, dk) pools in place instead of copying
        # them once per .at[].set.
        pool_keys = self._pool_keys

        def _finish(c, tokens, pc, logits, slot, t0, rng, sp,
                    sd, oc, seen, lb):
            c = dict(c)
            for key in pool_keys:  # slot axis is 1 for KV rows AND mv
                c[key] = c[key].at[:, slot].set(
                    pc[key][:, 0].astype(c[key].dtype))
            c["len"] = c["len"].at[slot].set(t0)
            r1 = lambda x: jnp.reshape(x, (1,))
            tok0 = self._pick_rows(
                logits, rng, r1(sp[0]), r1(sp[1]), r1(sp[2]),
                r1(sp[3]), r1(sp[4]), r1(sp[5]), r1(sp[6]), oc, seen,
                lb, seeds=sd[:1], ntoks=sd[1:2])[0]
            tokens = tokens.at[slot].set(tok0)
            if self._prefix_max:
                store = tuple(c[key][:, slot] for key in pool_keys)
            else:
                store = ()
            lpx = self._lp_of(logits, jnp.reshape(tok0, (1,)))
            return (c, tokens, tok0) + lpx + store

        def _adm_exact(params, c, tokens, prompt, slot, rng,
                       sp, sd, oc, seen, lb):
            logits, pc = prefill(self.model, params, prompt)
            return _finish(c, tokens, pc, logits, slot,
                           prompt.shape[1], rng, sp, sd, oc, seen, lb)

        def _adm_padded(params, c, tokens, prompt, t0, slot,
                        rng, sp, sd, oc, seen, lb):
            logits, pc = prefill_padded(self.model, params, prompt, t0)
            return _finish(c, tokens, pc, logits, slot, t0,
                           rng, sp, sd, oc, seen, lb)

        def _adm_chunk(params, c, tokens, entry, tail,
                       lcp, g, slot, rng, sp, sd, oc, seen, lb):
            # paste the entry's full-width rows; columns past lcp are the
            # OLD prompt's rows — the chunk overwrites [lcp, lcp+G) and
            # anything further is past this row's length, so masked out of
            # every softmax/standardization until overwritten by decode.
            c = dict(c)
            for key in pool_keys:
                c[key] = c[key].at[:, slot].set(entry[key])
            sl = lambda b: jax.lax.dynamic_slice_in_dim(b, slot, 1, 1)
            c1 = {key: sl(c[key]) for key in pool_keys}
            c1["len"] = jnp.reshape(lcp, (1,))
            logits_all, nc = decode_chunk_rows(
                self.model, params, c1, tail, c1["len"])
            logits = jax.lax.dynamic_index_in_dim(
                logits_all, g - 1, axis=1, keepdims=False)
            pc = {key: nc[key] for key in pool_keys}
            return _finish(c, tokens, pc, logits, slot,
                           lcp + g, rng, sp, sd, oc, seen, lb)

        donate = (1, 2)
        self._adm_exact_fn = jax.jit(_adm_exact, donate_argnums=donate)
        self._adm_padded_fn = jax.jit(_adm_padded, donate_argnums=donate)
        self._adm_chunk_fn = jax.jit(_adm_chunk, donate_argnums=donate)

        # chunked prefill: per-slot in-progress prompt feeds (one C-token
        # chunk per engine step; see the ctor docstring and _chunk_advance)
        self.chunk_prefill = (None if chunk_prefill is None
                              else int(chunk_prefill))
        if self.chunk_prefill is not None and not (
                0 < self.chunk_prefill <= self.block_size):
            raise ValueError(
                f"chunk_prefill {chunk_prefill} must be in "
                f"(0, block_size={self.block_size}]")
        self._chunk_state: Dict[int, dict] = {}

        def _chunk_feed(params, c, tail, base, g, slot):
            """Append one (1, C) token chunk to ``slot``'s rows at
            position ``base``; returns updated pools + the logits after
            the chunk's g-th (last real) token."""
            sl = lambda buf: jax.lax.dynamic_slice_in_dim(buf, slot, 1, 1)
            c1 = {key: sl(c[key]) for key in pool_keys}
            c1["len"] = jnp.reshape(base, (1,))
            logits_all, nc = decode_chunk_rows(
                self.model, params, c1, tail, c1["len"])
            c = dict(c)
            for key in pool_keys:
                c[key] = c[key].at[:, slot].set(
                    nc[key][:, 0].astype(c[key].dtype))
            logits = jax.lax.dynamic_index_in_dim(
                logits_all, g - 1, axis=1, keepdims=False)
            return c, logits

        self._chunk_feed_fn = jax.jit(_chunk_feed, donate_argnums=(1,))

        def _chunk_tok0(logits, rng, sp, sd, oc, seen, lb):
            r1 = lambda s: jnp.reshape(s, (1,))
            tok0 = self._pick_rows(
                logits, rng, r1(sp[0]), r1(sp[1]), r1(sp[2]),
                r1(sp[3]), r1(sp[4]), r1(sp[5]), r1(sp[6]), oc, seen,
                lb, seeds=sd[:1], ntoks=sd[1:2])[0]
            return (tok0,) + self._lp_of(logits, jnp.reshape(tok0, (1,)))

        self._chunk_tok0_fn = jax.jit(_chunk_tok0)

    def _make_cache(self, cfg, max_batch, kv_dtype, cache_sharding):
        """Allocate the per-slot KV state. Subclasses with a different
        cache layout (PagedDecodeEngine) override this so the dense
        ``max_batch x block_size`` slabs are never materialized."""
        cache = init_decode_cache(cfg, max_batch, kv_dtype,
                                  n_views=self._n_views)
        if cache_sharding is not None:
            for key in ("k", "k2", "v"):
                cache[key] = jax.device_put(cache[key], cache_sharding)
        # per-row length vector replaces the scalar shared 'len'
        cache["len"] = jnp.zeros((max_batch,), jnp.int32)
        return cache

    # ---------------- multi-LoRA ----------------

    def _init_lora_bank(self, adapters: Dict[str, dict], scale,
                        max_batch: int) -> None:
        names = list(adapters)
        paths = sorted(adapters[names[0]])
        scales = ({nm: float(scale) for nm in names}
                  if not isinstance(scale, dict) else
                  {nm: float(scale.get(nm, 1.0)) for nm in names})
        for nm in names:
            if sorted(adapters[nm]) != paths:
                raise ValueError(
                    f"adapter {nm!r} adapts a different kernel set than "
                    f"{names[0]!r}; all served adapters must share one "
                    "path set")
        for path in paths:
            node = self.params
            for part in path.split("/"):
                if not isinstance(node, dict) or part not in node:
                    raise ValueError(
                        f"adapter path {path!r} not found in params")
                node = node[part]
            din, r = adapters[names[0]][path]["a"].shape
            dout = adapters[names[0]][path]["b"].shape[1]
            if getattr(node, "shape", None) != (din, dout):
                raise ValueError(
                    f"adapter {path!r} factors ({din}, {r})x({r}, {dout}) "
                    f"do not match kernel shape "
                    f"{getattr(node, 'shape', None)}")
            a_stack = [jnp.zeros((din, r), jnp.float32)]
            b_stack = [jnp.zeros((r, dout), jnp.float32)]
            for nm in names:
                fa, fb = adapters[nm][path]["a"], adapters[nm][path]["b"]
                if fa.shape != (din, r) or fb.shape != (r, dout):
                    raise ValueError(
                        f"adapter {nm!r} path {path!r}: rank/shape differs "
                        "from the bank (all served adapters must share one "
                        "rank)")
                a_stack.append(jnp.asarray(fa, jnp.float32))
                b_stack.append(jnp.asarray(fb, jnp.float32) * scales[nm])
            self._lora_bank[path] = (jnp.stack(a_stack), jnp.stack(b_stack))
            self._lora_rows[path] = (
                jnp.zeros((max_batch, din, r), jnp.float32),
                jnp.zeros((max_batch, r, dout), jnp.float32))
        self._adapter_idx.update(
            {nm: i + 1 for i, nm in enumerate(names)})

    def _step_params(self):
        """Params view the batched decode step consumes (per-slot LoRA
        factor rows inserted when an adapter bank is configured)."""
        if not self._lora_bank:
            return self.params
        return lora_params_view(self.params, self._lora_rows)

    def _admit_params(self, aid: int):
        """Params view for a B=1 admission prefill: the admitted request's
        adapter factors as single-row stacks."""
        if not self._lora_bank:
            return self.params
        rows = {path: (a[aid][None], b[aid][None])
                for path, (a, b) in self._lora_bank.items()}
        return lora_params_view(self.params, rows)

    def _set_slot_adapter(self, slot: int, aid: int) -> None:
        if not self._lora_bank:
            return
        self._slot_adapter[slot] = aid
        for path, (a, b) in self._lora_bank.items():
            ra, rb = self._lora_rows[path]
            self._lora_rows[path] = (ra.at[slot].set(a[aid]),
                                     rb.at[slot].set(b[aid]))

    def _bucket_pad(self, prompt: np.ndarray):
        """(padded (1, bucket) array, t0) if a bucket fits, else None."""
        t0 = int(prompt.size)
        if self.prefill_buckets and t0 <= self.prefill_buckets[-1]:
            t_pad = next(b for b in self.prefill_buckets if b >= t0)
            padded = np.zeros((1, t_pad), np.int32)
            padded[0, :t0] = prompt
            return jnp.asarray(padded), t0
        return None

    # ---------------- sampling ----------------

    def _lp_of(self, logits, toks):
        """Logprob extras ``(lp, top_vals, top_ids)`` for emitted tokens,
        or ``()`` when tracking is off (``logprobs_topk == 0`` — the jitted
        callers' output arity is then unchanged). ``logits``: (..., vocab)
        raw model logits; ``toks``: matching leading shape. fp32
        log-softmax of the RAW logits (pre-temperature/penalties/bias —
        see the ctor docstring)."""
        if not self.logprobs_topk:
            return ()
        lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        lp = jnp.take_along_axis(
            lsm, toks[..., None].astype(jnp.int32), -1)[..., 0]
        tv, ti = jax.lax.top_k(lsm, self.logprobs_topk)
        return (lp, tv, ti)

    def _beam_tops(self, logits):
        """Beam extras ``(top_vals, top_ids)`` — each row's top
        ``max_beams`` fp32 log-probs — or ``()`` when beam support is off.
        Exactness: the global top-k over a group's k x V expansions only
        ever draws each parent's own k best, so this block is all the
        host selection needs."""
        if not self.max_beams:
            return ()
        lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tv, ti = jax.lax.top_k(lsm, self.max_beams)
        return (tv, ti)

    def _lp_entry(self, lp_h, tv_h, ti_h, idx):
        """Host-side (float, [(tok, lp), ...]) for row ``idx`` of the
        device-fetched extras."""
        return (float(lp_h[idx]),
                [(int(t), float(v))
                 for t, v in zip(ti_h[idx], tv_h[idx])])

    @staticmethod
    def _pick_rows(logits, rng, temp, topk, topp, minp, rep, pres, freq,
                   ocounts, pseen, lbias, seeds=None, ntoks=None):
        """Per-row sampler: each row has its own temperature (0 = greedy),
        top_k (0 = off), top_p (1.0 = off), min_p (0 = off), penalties
        (repetition 1.0 = off over prompt+output tokens; presence/frequency
        0.0 = off over output counts — the vLLM conventions), and an
        additive logit bias (0 = off; the OpenAI convention, applied before
        everything else, so ±large values ban/force tokens), so requests
        with different sampling params batch into one fixed-shape step.
        Bias and penalties apply before the greedy argmax too. Sampled in
        sorted-logit space: mask ranks >= top_k, tokens beyond the nucleus,
        and tokens under the min-p floor, draw, map back through argsort.

        ``ocounts``: (B, vocab) int32 output-token counts; ``pseen``:
        (B, vocab) bool prompt membership; ``lbias``: (B, vocab) float.

        ``seeds``/``ntoks`` ((B,) int32, optional): rows with
        ``seed >= 0`` IGNORE the engine's shared ``rng`` stream and draw
        from ``fold_in(PRNGKey(seed), ntok)`` — a per-row key identical
        in the batched step and the single-row admission pickers, which
        is what makes a seeded request's output independent of
        co-batching, engine rng, and paged preemption. Unseeded rows
        draw from the shared ``rng`` exactly as before the seed feature
        existed (one ``categorical`` over the (B, vocab) block), keeping
        unseeded streams bit-stable."""
        b, v = logits.shape
        logits = logits + lbias
        seen = pseen | (ocounts > 0)
        r = rep[:, None]
        logits = jnp.where(seen,
                           jnp.where(logits > 0, logits / r, logits * r),
                           logits)
        logits = logits - pres[:, None] * (ocounts > 0)
        logits = logits - freq[:, None] * ocounts
        greedy = jnp.argmax(logits, -1).astype(jnp.int32)
        scaled = logits / jnp.maximum(temp, 1e-6)[:, None]
        order = jnp.argsort(scaled, -1)[:, ::-1]  # descending
        srt = jnp.take_along_axis(scaled, order, -1)
        ranks = jnp.arange(v)[None, :]
        keep = ranks < jnp.where(topk > 0, topk, v)[:, None]
        probs = jax.nn.softmax(jnp.where(keep, srt, -jnp.inf), -1)
        cum = jnp.cumsum(probs, -1)
        keep &= (cum - probs) < topp[:, None]  # top token always kept
        # min-p in logit space: prob >= minp * max_prob  <=>
        # logit >= max_logit + log(minp); rank-0 (the max) always kept
        floor = srt[:, :1] + jnp.log(jnp.maximum(minp, 1e-38))[:, None]
        keep &= (srt >= floor) | (minp[:, None] <= 0.0)
        masked = jnp.where(keep, srt, -jnp.inf)
        choice = jax.random.categorical(rng, masked)
        if seeds is not None:
            keys = jax.vmap(lambda s, n: jax.random.fold_in(
                jax.random.PRNGKey(s), n))(seeds, ntoks)
            seeded = jax.vmap(jax.random.categorical)(keys, masked)
            choice = jnp.where(seeds >= 0, seeded, choice)
        sampled = jnp.take_along_axis(order, choice[:, None], -1)[:, 0]
        return jnp.where(temp <= 0.0, greedy, sampled).astype(jnp.int32)

    # ---------------- public API ----------------

    def submit(self, prompt, max_new_tokens: int,
               temperature: Optional[float] = None,
               top_k: Optional[int] = None,
               top_p: Optional[float] = None,
               eos_id: Optional[int] = None,
               min_p: Optional[float] = None,
               repetition_penalty: Optional[float] = None,
               presence_penalty: Optional[float] = None,
               frequency_penalty: Optional[float] = None,
               logit_bias: Optional[dict] = None,
               stop=None, adapter: Optional[str] = None,
               constraint=None, seed: Optional[int] = None,
               num_beams: Optional[int] = None,
               length_penalty: float = 1.0) -> int:
        """Queue a request. ``prompt``: 1-D int sequence, 1 <= len <
        block_size. Generation stops at ``max_new_tokens``, EOS, a ``stop``
        match, or the context window, whichever first.

        ``num_beams`` (requires an engine built with ``max_beams >= k``):
        beam-search THIS request over k beams; the result is the best
        beam ranked by cumulative log-prob / length^``length_penalty``,
        token-equal to ``models.beam.generate_beam`` single-stream. The
        request occupies k slots until it completes, emits nothing until
        then (no per-step streaming — earlier tokens can be rewritten by
        beam reordering), and is deterministic, so it rejects sampling
        overrides, penalties, logit_bias, stop sequences, adapters,
        constraints, and seeds. Admission waits until k slots are free
        (head-of-line: a big beam request blocks later arrivals until
        slots drain).

        ``constraint``: optional :class:`~mop_tpu.serving.TokenDFA` — the
        output must follow the automaton's token edges, EOS legal exactly
        in accepting states (guided decoding; see serving/constrain.py).
        The state's 0/-inf mask rides this slot's logit-bias row, so
        constrained and unconstrained requests batch into the same
        fixed-shape step. Requires an effective ``eos_id`` (completion is
        signalled through EOS). ``max_new_tokens``/window exhaustion can
        still truncate an unfinished constraint (same contract as
        unconstrained decoding).

        ``adapter``: name of a LoRA adapter from the engine's ``adapters``
        bank to apply to THIS request (None = base model). Requests with
        different adapters batch into the same decode step.

        ``logit_bias``: {token_id: float} added to that token's logit every
        step (±large values ban/force tokens — the OpenAI convention).
        ``stop``: sequence of stop specs, each an int (extra EOS-like
        token) or a token-id sequence (multi-token stop, matched host-side
        against the emitted suffix). The matched stop tokens remain in the
        result (same contract as EOS).

        ``temperature``/``top_k``/``top_p``/``eos_id``/``min_p``/
        ``repetition_penalty``/``presence_penalty``/``frequency_penalty``
        override the engine defaults FOR THIS REQUEST (None = use the
        engine's). Requests with different sampling params share the same
        fixed-shape batched step — the picker consumes them as per-row
        vectors (penalty semantics in :meth:`_pick_rows`).

        ``seed``: optional int in [0, 2**31) pinning THIS request's sample
        stream: its n-th output token draws from
        ``fold_in(PRNGKey(seed), n)``, so the output depends only on the
        prompt, the sampling params, and the seed — bit-reproducible
        regardless of co-batched traffic, engine step count, admission
        order, or paged preemption (the OpenAI ``seed`` semantics, made
        exact). Greedy rows (temperature 0) ignore it."""
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        if not 1 <= prompt.size < self.block_size:
            raise ValueError(
                f"prompt length {prompt.size} must be in [1, "
                f"{self.block_size})")
        # Validate ids here, at submit: an out-of-range id that reached
        # _admit_one would raise inside the engine-driving thread (e.g. the
        # HTTP server's device worker), killing it and hanging every
        # pending request.
        if prompt.min() < 0 or prompt.max() >= self._vocab:
            bad = int(prompt[(prompt < 0) | (prompt >= self._vocab)][0])
            raise ValueError(
                f"prompt token {bad} outside vocab [0, {self._vocab})")
        if max_new_tokens < 1:
            raise ValueError("max_new_tokens must be >= 1")
        temp = self.temperature if temperature is None else temperature
        tk = self.top_k if top_k is None else top_k
        tp = self.top_p if top_p is None else top_p
        eos = self.eos_id if eos_id is None else eos_id
        mp = self.min_p if min_p is None else min_p
        rp = self.repetition_penalty if repetition_penalty is None \
            else repetition_penalty
        pp = self.presence_penalty if presence_penalty is None \
            else presence_penalty
        fp = self.frequency_penalty if frequency_penalty is None \
            else frequency_penalty
        if temp < 0:
            raise ValueError(f"temperature must be >= 0, got {temp}")
        if tk is not None and tk < 0:
            raise ValueError(f"top_k must be >= 0, got {tk}")
        if tp is not None and not 0.0 < tp <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {tp}")
        if not 0.0 <= mp <= 1.0:
            raise ValueError(f"min_p must be in [0, 1], got {mp}")
        if rp <= 0.0:
            raise ValueError(
                f"repetition_penalty must be > 0, got {rp}")
        # negative eos is the explicit "never fires" idiom (matches the
        # internal -1 = none sentinel); above-vocab is always a bug
        if eos is not None and int(eos) >= self._vocab:
            raise ValueError(
                f"eos_id {eos} outside vocab [0, {self._vocab})")
        sp = (np.float32(temp), np.int32(tk or 0),
              np.float32(1.0 if tp is None else tp),
              np.int64(-1 if eos is None else eos),
              np.float32(mp), np.float32(rp), np.float32(pp),
              np.float32(fp))
        bias_row = None
        if logit_bias:
            bias_row = np.zeros((self._vocab,), np.float32)
            for t, b in logit_bias.items():
                t = int(t)
                if not 0 <= t < self._vocab:
                    raise ValueError(
                        f"logit_bias token {t} outside vocab "
                        f"[0, {self._vocab})")
                bias_row[t] = float(b)
        stops = []
        for s in (stop or ()):
            seq = [int(s)] if np.isscalar(s) else [int(t) for t in s]
            if not seq:
                raise ValueError("empty stop sequence")
            for t in seq:
                if not 0 <= t < self._vocab:
                    raise ValueError(
                        f"stop token {t} outside vocab [0, {self._vocab})")
            stops.append(seq)
        if adapter is not None and adapter not in self._adapter_idx:
            raise ValueError(
                f"unknown adapter {adapter!r}; engine has "
                f"{sorted(k for k in self._adapter_idx if k)}")
        aid = self._adapter_idx[adapter]
        if constraint is not None:
            eosi = int(sp[3])
            if eosi < 0:
                raise ValueError(
                    "a constrained request needs an eos_id (constraint "
                    "completion is signalled through EOS)")
            for state, edges in constraint.transitions.items():
                for t in edges:
                    if not 0 <= int(t) < self._vocab:
                        raise ValueError(
                            f"constraint state {state!r} allows token {t} "
                            f"outside vocab [0, {self._vocab})")
                    if int(t) == eosi:
                        raise ValueError(
                            f"constraint state {state!r} uses eos_id {eosi}"
                            " as a transition token; EOS may only END a "
                            "constrained output (accepting states)")
        if seed is not None and not 0 <= int(seed) < 2 ** 31:
            raise ValueError(f"seed must be in [0, 2**31), got {seed}")
        seed_q = -1 if seed is None else int(seed)
        nb = None
        if num_beams is not None and int(num_beams) == 1:
            # k=1 beam search IS greedy decoding — honor it exactly
            # (a sampling-temperature engine default must not leak in;
            # length_penalty is a no-op with a single candidate)
            if temperature not in (None, 0, 0.0) or top_k is not None \
                    or top_p not in (None, 1.0) or seed is not None:
                raise ValueError(
                    "num_beams=1 is deterministic greedy; sampling "
                    "overrides/seed cannot combine with it")
            temp = 0.0
            sp = (np.float32(0.0),) + sp[1:]
        if num_beams is not None and int(num_beams) != 1:
            nb = int(num_beams)
            if self.logprobs_topk:
                raise ValueError(
                    "num_beams on a logprobs-tracking engine is not "
                    "supported: beams record no per-token logprobs, "
                    "which would break the results/logprobs 1:1 "
                    "invariant")
            if not 2 <= nb <= self.max_beams:
                raise ValueError(
                    f"num_beams {nb} needs an engine built with "
                    f"max_beams >= {nb} (max_beams={self.max_beams})")
            if nb > self.model.vocab_size:
                raise ValueError(
                    f"num_beams {nb} exceeds vocab_size "
                    f"{self.model.vocab_size}")
            if prompt.size + max_new_tokens > self.block_size:
                raise ValueError(
                    "beam search needs t0 + max_new_tokens <= block_size "
                    f"({prompt.size} + {max_new_tokens} > "
                    f"{self.block_size}): beams cannot retire early row "
                    "by row")
            # only EXPLICIT per-request overrides are rejected — engine
            # sampling defaults are simply ignored (beam rows are greedy)
            if temperature not in (None, 0, 0.0) or top_k is not None \
                    or top_p not in (None, 1.0) or min_p not in (None, 0.0) \
                    or repetition_penalty not in (None, 1.0) \
                    or presence_penalty not in (None, 0.0) \
                    or frequency_penalty not in (None, 0.0) \
                    or logit_bias or stops or adapter is not None \
                    or constraint is not None or seed is not None:
                raise ValueError(
                    "beam search is deterministic: sampling overrides, "
                    "penalties, logit_bias, stop sequences, adapters, "
                    "constraints, and seeds are not supported with "
                    "num_beams")
        rid = self._next_rid
        self._next_rid += 1
        self._queue.append((rid, prompt, max_new_tokens, sp, bias_row,
                            stops, aid, constraint, seed_q, nb,
                            float(length_penalty)))
        self._results[rid] = []
        self._done[rid] = False
        if self.logprobs_topk:
            self._logprobs[rid] = []
            self._top_logprobs[rid] = []
        return rid

    @property
    def n_active(self) -> int:
        return sum(r >= 0 for r in self._slot_rid)

    @property
    def n_queued(self) -> int:
        return len(self._queue)


    def _bias_mask_row(self, slot: int) -> Optional[np.ndarray]:
        """This slot's combined (vocab,) additive bias: the user's
        logit_bias plus the constraint state's 0/-inf mask (None if the
        slot has neither)."""
        user = self._slot_bias[slot]
        con = self._slot_constraint[slot]
        if con is None:
            return user
        row = mask_row(con, self._slot_cstate[slot], self._vocab,
                       int(self._slot_eos[slot]))
        return row if user is None else row + user

    def _replay_constraint(self, con, rid: int):
        """DFA state after the tokens already emitted for ``rid`` (only
        non-initial on paged re-admission after preemption — emitted
        tokens are DFA-legal by construction, so the replay never
        dead-ends)."""
        if con is None:
            return None
        state = con.init_state()
        for t in self._results[rid]:
            state = con.advance(state, int(t))
        return state

    def _emit_token(self, emitted: Dict[int, List[int]], slot: int,
                    rid: int, tok: int, new_len: int, lp=None) -> bool:
        """Record one emitted token; retire the slot on EOS / window-full /
        budget-exhausted. Returns whether the request is still live.
        ``lp``: (logprob, [(tok, logprob), ...]) when the engine tracks
        logprobs — every emit path must supply it then (the lists stay
        1:1 with ``results``)."""
        self.tokens_generated += 1
        self._slot_ntok[slot] += 1  # next pick = seeded-stream position n+1
        res = self._results[rid]
        res.append(tok)
        if self.logprobs_topk:
            if lp is None:
                raise RuntimeError(
                    "logprob tracking is on but an emit path supplied no "
                    "logprob (results/logprobs would desynchronize)")
            self._logprobs[rid].append(lp[0])
            self._top_logprobs[rid].append(lp[1])
        emitted.setdefault(rid, []).append(tok)
        self._budget[slot] -= 1
        hit_eos = tok == self._slot_eos[slot]
        hit_stop = any(len(res) >= len(sq) and res[-len(sq):] == sq
                       for sq in self._slot_stops[slot])
        # the next decode would append at position new_len
        if hit_eos or hit_stop or new_len >= self.block_size \
                or self._budget[slot] <= 0:
            self._slot_rid[slot] = -1
            self._slot_constraint[slot] = None
            self._slot_cstate[slot] = None
            self._done[rid] = True
            return False
        con = self._slot_constraint[slot]
        if con is not None:
            ns = con.advance(self._slot_cstate[slot], tok)
            if ns is None:  # the mask bans every illegal edge; unreachable
                raise RuntimeError(
                    f"constrained slot {slot} emitted banned token {tok} "
                    f"in state {self._slot_cstate[slot]!r}")
            self._slot_cstate[slot] = ns
            self._lbias = self._lbias.at[slot].set(
                jnp.asarray(self._bias_mask_row(slot)))
        return True

    def step(self, n_tokens: int = 1) -> Dict[int, List[int]]:
        """One engine iteration: admit whatever fits (each admission emits
        the prefill's first sampled token; a request whose budget is 1 or
        whose first token is EOS completes without ever decoding), then
        advance all live rows one token. Returns this iteration's
        ``{rid: [tokens]}`` (a request admitted this call emits up to 2).

        ``n_tokens > 1``: MULTI-STEP decoding — up to n_tokens fixed-shape
        decode steps run as ONE device dispatch (a ``lax.scan``), so the
        per-dispatch host/tunnel latency that dominates serving tok/s
        amortizes over the burst (vLLM's multi-step scheduling, XLA
        style). Emitted tokens are IDENTICAL to n_tokens single steps
        (the rng stream, per-row samplers, penalty counts, and seeded
        positions all advance per inner step; pinned in
        tests/test_serving_multistep.py); a row that hits EOS / a stop
        match / its budget / the window mid-burst retires there and its
        later burst tokens are discarded (bounded wasted compute, never
        wrong output) — so one short-budget row does NOT collapse the
        burst for its co-tenants (k caps at the largest eligible
        headroom). CONSTRAINED requests and chunk-pending slots sit the
        burst out PER-SLOT (a DFA mask must update between tokens):
        they are held in place by the burst's elig mask and advance one
        token via a follow-up single step in the same call, while
        unconstrained co-tenants keep the full k. Only a live beam
        group forces k=1 globally (its step permutes the entire pool).
        Admission still happens once per ``step`` call — new arrivals
        wait at most one burst."""
        self.engine_steps += 1
        emitted: Dict[int, List[int]] = {}
        emit = lambda *a: self._emit_token(emitted, *a)

        # admission (loops because a request can complete on its tok0,
        # freeing the slot for the next queued request; a chunked-prefill
        # admission reserves its slot with tok0 = None — nothing to emit
        # until its last chunk lands)
        while self._queue:
            adm = self._admit_one()
            if adm is None:
                break
            if adm[2] is not None:
                emit(*adm)

        # chunked prefill: one C-token chunk per pending slot per step
        # (bounds this step's prefill work at C tokens per pending prompt);
        # a slot whose final chunk lands emits its tok0 and decodes below
        for slot in list(self._chunk_state):
            fin = self._chunk_advance(slot)
            if fin is not None:
                emit(*fin)

        active = [s for s, r in enumerate(self._slot_rid)
                  if r >= 0 and s not in self._chunk_state]
        if active and n_tokens > 1:
            k, lens_h, elig = self._multi_k(n_tokens, active)
            if k > 1:
                self._step_multi(elig, k, emit, lens_h)
                elig_set = set(elig)
                # ineligible (constrained) co-tenants advance ONE token
                # via the single-step path below — per-slot degradation:
                # they sit out the burst, the burst rows sit out (held by
                # the adv mask) their step
                active = [s for s in active if s not in elig_set
                          and self._slot_rid[s] >= 0]
        if active:
            # rows NOT in `active` (inactive slots, chunk-pending, rows
            # that just took the burst above) are held in place by the
            # adv mask inside the jitted step — token/len/penalty counts
            # pinned, their garbage K/V column overwritten by the next
            # real feed (see _step's docstring)
            adv = np.zeros((self.max_batch,), bool)
            adv[active] = True
            self._rng, sub = jax.random.split(self._rng)
            nxt, self._cache, self._ocounts, *extras = self._step_fn(
                self._step_params(), self._cache, self._tokens,
                self._cache["len"], sub,
                jnp.asarray(self._slot_seed.astype(np.int32)),
                jnp.asarray(self._slot_ntok.astype(np.int32)),
                jnp.asarray(self._slot_temp),
                jnp.asarray(self._slot_topk), jnp.asarray(self._slot_topp),
                jnp.asarray(self._slot_minp), jnp.asarray(self._slot_rep),
                jnp.asarray(self._slot_pres), jnp.asarray(self._slot_freq),
                self._ocounts, self._pseen, self._lbias, jnp.asarray(adv))
            lp_n = 3 if self.logprobs_topk else 0
            lpx, btx = extras[:lp_n], extras[lp_n:]
            self._tokens = nxt
            # ONE host fetch per step whatever is tracked: a second
            # device_get is a second dispatch round-trip, which at
            # serving scale costs as much as the decode step itself
            toks, lens, *rest = jax.device_get(
                (nxt, self._cache["len"], *lpx, *btx))
            lph, bth = rest[:lp_n], rest[lp_n:]
            beam_slots = {s for g in self._beam_groups.values()
                          for s in g["slots"]}
            if self.logprobs_topk:
                for s in active:
                    if s in beam_slots:
                        continue
                    emit(s, self._slot_rid[s], int(toks[s]), int(lens[s]),
                         self._lp_entry(lph[0], lph[1], lph[2], s))
            else:
                for s in active:
                    if s in beam_slots:
                        continue
                    emit(s, self._slot_rid[s], int(toks[s]), int(lens[s]))
            self._zero_dead_lens(
                [s for s in active if self._slot_rid[s] < 0])
            if self._beam_groups:
                perm, newtoks, changed = self._beam_step_update(
                    bth[0], bth[1], toks)
                if changed and (perm != np.arange(self.max_batch)).any():
                    self._cache, self._tokens = self._beam_apply_fn(
                        self._cache, jnp.asarray(perm),
                        jnp.asarray(newtoks))
                elif changed:
                    # identity permutation (every beam extended itself):
                    # skip the whole-pool gather, just install tokens
                    self._tokens = jnp.asarray(newtoks)
        for rid, toks_f in self._beam_finalized:
            emitted.setdefault(rid, []).extend(toks_f)
        self._beam_finalized.clear()
        return emitted

    def _multi_k(self, n_tokens: int, active):
        """Burst size + eligible slots for multi-step decoding.

        Eligibility is PER-SLOT: constrained requests (DFA mask updates
        between tokens) sit out the burst and advance one token via the
        follow-up single step, while unconstrained co-tenants keep their
        full k — one constrained request no longer degrades the whole
        pool. Chunk-pending slots are excluded from ``active`` upstream
        and held by the burst's elig mask. Beam groups still force k=1
        globally (a beam step permutes the entire slot pool).

        k caps at the LARGEST eligible row's headroom (min of remaining
        budget and window room) — NOT the smallest: a row one token from
        retirement retires mid-burst and its later burst tokens are
        discarded (bounded wasted compute), instead of collapsing every
        co-tenant's burst to k=1.

        Returns ``(k, lens_host, elig_slots)`` — the one ``len`` fetch
        is shared with :meth:`_step_multi` (each device_get is a
        dispatch round-trip)."""
        if self._beam_groups:
            return 1, None, None
        elig = [s for s in active if self._slot_constraint[s] is None]
        if not elig:
            return 1, None, None
        lens_h = np.asarray(jax.device_get(self._cache["len"]))
        headroom = max(min(int(self._budget[s]),
                           self.block_size - int(lens_h[s]))
                       for s in elig)
        k = min(int(n_tokens), max(headroom, 1))
        return k, lens_h, elig

    def _step_multi(self, elig, k: int, emit, lens0) -> None:
        """k decode steps in one dispatch + host emission of the burst
        (see ``step``'s n_tokens docstring). ``elig``: the slots taking
        the burst (every other row is held in place by _mstep's elig
        mask). ``lens0``: the host copy of ``cache['len']`` _multi_k
        already fetched. A row that retires mid-burst keeps advancing
        on-device; its post-retirement writes land either out of the
        window (dropped/clamped scatter into its own retiring row) or at
        positions its replacement's admission paste overwrites."""
        emask = np.zeros((self.max_batch,), bool)
        emask[elig] = True
        out = self._mstep_fn(
            self._step_params(), self._cache, self._tokens, self._rng,
            jnp.asarray(self._slot_seed.astype(np.int32)),
            jnp.asarray(self._slot_ntok.astype(np.int32)),
            jnp.asarray(self._slot_temp),
            jnp.asarray(self._slot_topk), jnp.asarray(self._slot_topp),
            jnp.asarray(self._slot_minp), jnp.asarray(self._slot_rep),
            jnp.asarray(self._slot_pres), jnp.asarray(self._slot_freq),
            self._ocounts, self._pseen, self._lbias, k,
            jnp.asarray(emask))
        self._cache, self._tokens, self._rng, self._ocounts = out[:4]
        toks_k = out[4]
        lpx = out[5:]
        toks_h, *lph = jax.device_get((toks_k, *lpx))  # one fetch
        live = set(elig)
        for j in range(k):
            for s in list(live):
                rid = self._slot_rid[s]
                lp = (self._lp_entry(lph[0][j], lph[1][j], lph[2][j], s)
                      if self.logprobs_topk else None)
                args = (s, rid, int(toks_h[j, s]),
                        int(lens0[s]) + j + 1)
                ok = emit(*args, lp) if self.logprobs_topk \
                    else emit(*args)
                if not ok:
                    live.discard(s)  # retired: later burst tokens are
                    # the post-EOS garbage of multi-step scheduling
        self._zero_dead_lens([s for s in elig if self._slot_rid[s] < 0])

    def _zero_dead_lens(self, dead) -> None:
        """Zero retired slots' device lengths (the adv/elig masks hold
        non-advancing rows rather than zeroing all inactive rows each
        step, so retirement must reset explicitly — one scatter, only on
        steps where something retired)."""
        if dead and self._cache is not None:
            self._cache["len"] = self._cache["len"].at[
                jnp.asarray(np.asarray(dead, np.int32))].set(0)

    def run(self, n_tokens: int = 1) -> Dict[int, List[int]]:
        """Step until every queued/live request completes; returns all
        results (also available per-request in ``results``).
        ``n_tokens``: burst size per step (multi-step decoding —
        supported by DecodeEngine and PagedDecodeEngine;
        SpecDecodeEngine's step already advances up to gamma+1 tokens
        per dispatch and takes no n_tokens)."""
        while self._queue or self.n_active:
            if n_tokens == 1:
                self.step()
            else:
                self.step(n_tokens=n_tokens)
        return {rid: list(toks) for rid, toks in self._results.items()}

    @property
    def results(self) -> Dict[int, List[int]]:
        return self._results

    @property
    def logprobs(self) -> Dict[int, List[float]]:
        """Per-request emitted-token logprobs, 1:1 with ``results``
        (populated only when the engine was built with
        ``logprobs_topk > 0``; fp32 log-softmax of the raw logits)."""
        return self._logprobs

    @property
    def top_logprobs(self) -> Dict[int, List[list]]:
        """Per-request top-``logprobs_topk`` alternatives per emitted
        token: lists of ``[(token_id, logprob), ...]`` sorted most-likely
        first, 1:1 with ``results``."""
        return self._top_logprobs

    def is_done(self, rid: int) -> bool:
        return self._done[rid]

    def cancel(self, rid: int) -> bool:
        """Cancel a request. Queued: removed before ever touching the
        device. Active: its slot is freed for the next queued request (the
        fixed-shape step keeps running for the other rows; the freed row's
        length is zeroed on the next step like any retired slot). Tokens
        already emitted stay in ``results``. Returns False if ``rid`` is
        unknown or already finished — cancellation is then a no-op."""
        if self._done.get(rid, True):
            return False
        for i, item in enumerate(self._queue):
            if item[0] == rid:
                del self._queue[i]
                self._done[rid] = True
                return True
        if rid in self._beam_groups:  # active beam group: free all slots
            g = self._beam_groups.pop(rid)
            for s in g["slots"]:
                self._slot_rid[s] = -1
            self._zero_dead_lens(list(g["slots"]))
            self._done[rid] = True
            return True
        slot = self._slot_rid.index(rid)  # not done, not queued -> active
        self._slot_rid[slot] = -1
        self._chunk_state.pop(slot, None)  # may be mid-chunked-prefill
        self._zero_dead_lens([slot])
        self._done[rid] = True
        return True

    # ---------------- internals ----------------

    def _admit_one(self) -> Optional[Tuple[int, int, int, int]]:
        """Admit the next queued request into a free slot (B=1 prefill
        pasted into the pool). Returns (slot, rid, tok0, prompt_len, lp0)
        or None if no slot is free; tok0 is None when chunked prefill
        reserved the slot and the prompt is still feeding
        (_chunk_advance emits the real tok0 after the last chunk); lp0 is
        tok0's logprob entry or None when tracking is off."""
        if not self._queue:
            return None
        if self._queue[0][9] is not None:  # beam request at the head
            return self._admit_beam()
        try:
            slot = self._slot_rid.index(-1)
        except ValueError:
            return None
        (rid, prompt, max_new, sp, bias_row, stops, aid, con, seed,
         _nb, _lpen) = self._queue.popleft()
        t0 = int(prompt.size)
        c = self._cache
        self._slot_seed[slot] = seed
        # tokens already emitted for this rid (non-zero only on paged
        # re-admission): the seeded stream continues at that position, so
        # a preempted seeded request replays bit-exactly
        self._slot_ntok[slot] = len(self._results[rid])
        sd = np.asarray([seed, self._slot_ntok[slot]], np.int32)
        self._rng, sub = jax.random.split(self._rng)
        entry, lcp = self._prefix_lookup(prompt, aid)
        slot_ = np.int32(slot)
        self._set_slot_adapter(slot, aid)
        (self._slot_temp[slot], self._slot_topk[slot],
         self._slot_topp[slot], self._slot_eos[slot],
         self._slot_minp[slot], self._slot_rep[slot],
         self._slot_pres[slot], self._slot_freq[slot]) = sp
        self._slot_bias[slot] = bias_row
        self._slot_stops[slot] = stops
        self._slot_constraint[slot] = con
        self._slot_cstate[slot] = self._replay_constraint(con, rid)
        brow = self._bias_mask_row(slot)
        lb = jnp.zeros((1, self._vocab), jnp.float32) if brow is None \
            else jnp.asarray(brow)[None]
        self._lbias = self._lbias.at[slot].set(lb[0])
        # picker scalars (everything but eos) + penalty-state rows: output
        # counts from tokens ALREADY emitted for this rid (non-empty only on
        # paged re-admission after preemption), prompt membership from the
        # queued prefix
        spk = (sp[0], sp[1], sp[2], sp[4], sp[5], sp[6], sp[7])
        oc = np.zeros((1, self._vocab), np.int32)
        prev = self._results[rid]
        if prev:
            np.add.at(oc[0], np.asarray(prev, np.int64), 1)
        seen = np.zeros((1, self._vocab), bool)
        seen[0, prompt] = True
        oc_j, seen_j = jnp.asarray(oc), jnp.asarray(seen)
        base = lcp if entry is not None else 0
        if self.chunk_prefill is not None and t0 - base > self.chunk_prefill:
            # chunked prefill: reserve the slot and feed the prompt one
            # C-token chunk per step (_chunk_advance) instead of one
            # monolithic dispatch; tok0 is sampled after the last chunk
            if entry is not None:
                for key in self._pool_keys:
                    c[key] = c[key].at[:, slot].set(entry[key])
                self.prefix_cache_hits += 1
                self.prefix_tokens_reused += lcp
            c["len"] = c["len"].at[slot].set(base)
            self._chunk_state[slot] = {
                "rid": rid, "prompt": prompt, "fed": base, "t0": t0,
                "spk": spk, "sd": sd, "oc": oc_j, "seen": seen_j,
                "lb": lb, "aid": aid}
            self._slot_rid[slot] = rid
            self._budget[slot] = max_new
            return slot, rid, None, t0, None
        pools = (self._admit_params(aid), c, self._tokens)
        if entry is not None:
            g = t0 - lcp
            g_pad = 1 << (g - 1).bit_length() if g > 1 else 1
            tail = np.zeros((1, g_pad), np.int32)
            tail[0, :g] = prompt[lcp:]
            ent = {key: entry[key] for key in self._pool_keys}
            out = self._adm_chunk_fn(
                *pools, ent,
                jnp.asarray(tail), np.int32(lcp), np.int32(g), slot_, sub,
                spk, sd, oc_j, seen_j, lb)
            self.prefix_cache_hits += 1
            self.prefix_tokens_reused += lcp
        else:
            padded = self._bucket_pad(prompt)
            if padded is not None:
                out = self._adm_padded_fn(*pools, padded[0],
                                          np.int32(padded[1]), slot_, sub,
                                          spk, sd, oc_j, seen_j, lb)
            else:
                out = self._adm_exact_fn(*pools, prompt[None, :], slot_,
                                         sub, spk, sd, oc_j, seen_j, lb)
        self._cache, self._tokens, tok0 = out[:3]
        lp0 = None
        if self.logprobs_topk:
            # one fetch for tok0 + extras (int(tok0) alone would be a
            # separate round-trip)
            tok0, lp_h, tv_h, ti_h = jax.device_get((tok0,) + out[3:6])
            lp0 = self._lp_entry(lp_h, tv_h, ti_h, 0)
            store = out[6:]
        else:
            store = out[3:]
        tok0 = int(tok0)
        # tok0 is this request's first output token -> counted
        self._ocounts = self._ocounts.at[slot].set(oc_j[0].at[tok0].add(1))
        self._pseen = self._pseen.at[slot].set(seen_j[0])
        self._slot_rid[slot] = rid
        self._budget[slot] = max_new  # tokens still to emit, incl. tok0
        self._prefix_store(prompt, store, aid)
        self._on_admit(slot, prompt)
        return slot, rid, tok0, t0, lp0

    # ---------------- beam groups ----------------

    def _admit_beam(self):
        """Admit the beam request at the queue head into k free slots
        (ONE prefill fanned out; the fan-out step of generate_beam).
        Returns a (slot, rid, None, t0, None) marker — beam requests
        emit nothing until they finalize — or None if fewer than k
        slots are free (head-of-line wait)."""
        free = [s for s, r in enumerate(self._slot_rid) if r < 0]
        nb = self._queue[0][9]
        if len(free) < nb:
            return None
        (rid, prompt, max_new, sp, _bias, _stops, _aid, _con, _seed,
         nb, lpen) = self._queue.popleft()
        slots = free[:nb]
        t0 = int(prompt.size)
        self._cache, self._tokens, scores, toks = self._adm_beam_fn(
            self.params, self._cache, self._tokens, prompt[None, :],
            jnp.asarray(slots, jnp.int32), nb)
        scores_h, toks_h = jax.device_get((scores, toks))
        eos = int(sp[3])  # -1 = none
        alive = np.ones((nb,), bool) if eos < 0 else (toks_h != eos)
        zrow = jnp.zeros((self._vocab,), jnp.float32)
        for s in slots:
            self._slot_rid[s] = rid
            self._slot_temp[s] = 0.0
            self._slot_topk[s] = 0
            self._slot_topp[s] = 1.0
            self._slot_eos[s] = -1  # the host hypothesis set owns EOS
            self._slot_minp[s] = 0.0
            self._slot_rep[s] = 1.0
            self._slot_pres[s] = 0.0
            self._slot_freq[s] = 0.0
            self._slot_seed[s] = -1
            self._slot_stops[s] = []
            self._slot_constraint[s] = None
            self._slot_cstate[s] = None
            self._slot_bias[s] = None
            self._budget[s] = max_new
            self._lbias = self._lbias.at[s].set(zrow)
        self._beam_groups[rid] = {
            "slots": slots, "k": nb, "lenpen": float(lpen),
            "scores": np.asarray(scores_h, np.float32),
            "alive": alive,
            "hyp_len": np.ones((nb,), np.int32),
            "bufs": [[int(t)] for t in toks_h],
            "eos": None if eos < 0 else eos,
            "pad": 0 if eos < 0 else eos,
            "budget": max_new - 1,
        }
        if max_new <= 1 or not alive.any():
            self._finalize_beam(rid)
        return slots[0], rid, None, t0, None

    def _finalize_beam(self, rid: int) -> None:
        """Rank the group's hypotheses (score / length^lenpen, the
        generate_beam formulation), record the best beam's tokens as
        the request result, free the slots."""
        g = self._beam_groups.pop(rid)
        norm = np.maximum(g["hyp_len"].astype(np.float32),
                          np.float32(1.0)) ** np.float32(g["lenpen"])
        final = g["scores"] / norm
        best = int(np.argsort(-final, kind="stable")[0])
        toks = g["bufs"][best][: int(g["hyp_len"][best])]
        self._results[rid] = [int(t) for t in toks]
        self.tokens_generated += len(toks)
        self._done[rid] = True
        for s in g["slots"]:
            self._slot_rid[s] = -1
        self._beam_finalized.append((rid, self._results[rid]))

    def _beam_step_update(self, btv, bti, toks_host) -> tuple:
        """Host beam selection after a device step: for each live group
        pick the top k of its k x k candidate block (EXACT — each
        parent's top k bound the global top k; ties break on the
        parent-major flat index, matching lax.top_k in generate_beam's
        ``_beam_select``). Returns (perm, newtoks, changed) for the
        device-side cache permutation."""
        perm = np.arange(self.max_batch)
        newtoks = None
        changed = False
        for rid in list(self._beam_groups):
            g = self._beam_groups[rid]
            slots, k = g["slots"], g["k"]
            V = self._vocab
            cand = []  # (-score, flat_index, parent, token)
            for j, s in enumerate(slots):
                if g["alive"][j]:
                    for r in range(k):
                        tok = int(bti[s][r])
                        cand.append((-(g["scores"][j]
                                       + np.float32(btv[s][r])),
                                     j * V + tok, j, tok))
                else:
                    cand.append((-g["scores"][j], j * V + g["pad"], j,
                                 g["pad"]))
            cand.sort()
            top = cand[:k]
            new_scores = np.asarray([-c[0] for c in top], np.float32)
            parents = [c[2] for c in top]
            toks = [c[3] for c in top]
            new_alive = np.asarray(
                [g["alive"][p] and (g["eos"] is None or t != g["eos"])
                 for p, t in zip(parents, toks)], bool)
            p_alive = np.asarray([g["alive"][p] for p in parents], bool)
            g["bufs"] = [g["bufs"][p]
                         + [t if pa else g["pad"]]
                         for p, t, pa in zip(parents, toks, p_alive)]
            g["hyp_len"] = np.asarray(
                [g["hyp_len"][p] + (1 if pa else 0)
                 for p, pa in zip(parents, p_alive)], np.int32)
            g["scores"] = new_scores
            g["alive"] = new_alive
            g["budget"] -= 1
            if newtoks is None:
                newtoks = np.asarray(toks_host, np.int32).copy()
            for i, (p, t) in enumerate(zip(parents, toks)):
                perm[slots[i]] = slots[p]
                newtoks[slots[i]] = t if p_alive[i] else g["pad"]
            changed = True
            if g["budget"] <= 0 or not new_alive.any():
                self._finalize_beam(rid)
        return perm, newtoks, changed

    def _chunk_advance(self, slot: int):
        """Feed the next C-token chunk of ``slot``'s pending prompt
        (chunked prefill). On the final chunk, samples the request's
        first token through the full per-slot picker and activates the
        slot; returns (slot, rid, tok0, t0, lp0) then, None while
        feeding."""
        st = self._chunk_state[slot]
        C = self.chunk_prefill
        prompt, fed, t0 = st["prompt"], st["fed"], st["t0"]
        g = min(C, t0 - fed)
        tail = np.zeros((1, C), np.int32)
        tail[0, :g] = prompt[fed:fed + g]
        self._cache, logits = self._chunk_feed_fn(
            self._admit_params(st["aid"]), self._cache,
            jnp.asarray(tail), np.int32(fed), np.int32(g), np.int32(slot))
        c = self._cache
        st["fed"] = fed + g
        c["len"] = c["len"].at[slot].set(st["fed"])
        if st["fed"] < t0:
            return None
        # final chunk: sample tok0 and hand the slot to the decode step
        self._rng, sub = jax.random.split(self._rng)
        tok0, *lpx = self._chunk_tok0_fn(
            logits, sub, st["spk"], st["sd"], st["oc"], st["seen"],
            st["lb"])
        lp0 = None
        if self.logprobs_topk:
            tok0, lp_h, tv_h, ti_h = jax.device_get((tok0, *lpx))
            lp0 = self._lp_entry(lp_h, tv_h, ti_h, 0)
        tok0 = int(tok0)
        self._ocounts = self._ocounts.at[slot].set(
            st["oc"][0].at[tok0].add(1))
        self._pseen = self._pseen.at[slot].set(st["seen"][0])
        self._tokens = self._tokens.at[slot].set(tok0)
        if self._prefix_max:
            self._prefix_store(
                prompt,
                tuple(c[key][:, slot] for key in self._pool_keys),
                st["aid"])
        del self._chunk_state[slot]
        self._on_admit(slot, prompt)
        return slot, st["rid"], tok0, t0, lp0

    # ---------------- prefix cache ----------------

    def _prefix_lookup(self, prompt: np.ndarray, aid: int = 0):
        """Longest shared prefix between ``prompt`` and any cached entry
        COMPUTED UNDER THE SAME ADAPTER (K/K2/V rows depend on the LoRA
        factors, so entries only match within an adapter id).
        Returns (entry, lcp) with 1 <= lcp <= len(prompt)-1, or (None, 0).
        (Capped at len-1: the chunk continuation needs at least one tail
        token to produce the admission logits.)"""
        if not self._prefix_max:
            return None, 0
        best_key, best_lcp = None, 0
        for key, entry in self._prefix_lru.items():
            if entry["aid"] != aid:
                continue
            toks = entry["tokens"]
            m = min(toks.size, prompt.size - 1)
            if m <= best_lcp:
                continue
            neq = np.nonzero(toks[:m] != prompt[:m])[0]
            lcp = int(neq[0]) if neq.size else m
            if lcp > best_lcp:
                best_key, best_lcp = key, lcp
        if best_lcp < 1:
            return None, 0
        self._prefix_lru.move_to_end(best_key)
        return self._prefix_lru[best_key], best_lcp

    def _prefix_store(self, prompt: np.ndarray, store, aid: int = 0) -> None:
        """LRU-store this prompt's full-width K/K2/V slot rows (the fused
        admission's extra outputs — columns past len(prompt) are garbage
        but a later reuse pastes the whole row and chunks from the shared
        prefix, so they never enter any softmax). Keyed by (adapter id,
        tokens) — see :meth:`_prefix_lookup`. Entry HBM cost:
        3 * L * H * block * dk * itemsize each."""
        if not self._prefix_max or not store:
            return
        key = (aid, prompt.tobytes())
        if key in self._prefix_lru:
            self._prefix_lru.move_to_end(key)
            return
        entry = {"tokens": prompt.copy(), "aid": aid}
        entry.update(zip(self._pool_keys, store))
        self._prefix_lru[key] = entry
        while len(self._prefix_lru) > self._prefix_max:
            self._prefix_lru.popitem(last=False)

    def _on_admit(self, slot: int, prompt: np.ndarray) -> None:
        """Subclass hook: called after a request is pasted into ``slot``."""


class SpecDecodeEngine(DecodeEngine):
    """Continuous batching WITH speculative decoding (greedy only).

    Every live slot advances 1..gamma+1 tokens per engine step: a small
    draft model proposes gamma tokens per row from its own slot-pool KV
    cache, the target verifies all rows x all positions in ONE
    ``decode_chunk_rows`` call, and each row keeps its longest matching
    prefix plus the target's correction/bonus token. Greedy speculative
    decoding is exact — every emitted token is the target's own argmax
    given the same prefix — so results equal ``DecodeEngine``'s for any
    draft (pinned in tests/test_serving_speculative.py); the draft only
    changes how many engine steps (target passes) it takes.

    One behavioral difference: a slot retires when the next speculative
    round would not fit the context window (``len + gamma + 1 >
    block_size``) — budget that close to the window edge is truncated
    (the plain engine fills up to ``block_size`` exactly).
    """

    def __init__(self, model, params, draft_model, draft_params,
                 max_batch: int = 8, gamma: int = 4,
                 eos_id: Optional[int] = None, cache_sharding=None,
                 prefill_buckets: Optional[Sequence[int]] = None,
                 prefix_cache_entries: int = 0, kv_dtype=jnp.float32,
                 logprobs_topk: int = 0):
        super().__init__(model, params, max_batch=max_batch, eos_id=eos_id,
                         temperature=0.0, cache_sharding=cache_sharding,
                         prefill_buckets=prefill_buckets,
                         prefix_cache_entries=prefix_cache_entries,
                         kv_dtype=kv_dtype, logprobs_topk=logprobs_topk)
        if gamma < 1:
            raise ValueError(f"gamma must be >= 1, got {gamma}")
        self.draft_model = draft_model
        self.draft_params = draft_params
        self.gamma = gamma
        dcfg = draft_model.config
        if dcfg.block_size < self.block_size:
            raise ValueError(
                f"draft block_size {dcfg.block_size} must be >= target's "
                f"{self.block_size}")
        d_keys = (("k", "k2", "v", "mv") if model_n_views(draft_model)
                  else ("k", "k2", "v"))
        self._dcache = init_decode_cache(
            dcfg, max_batch, kv_dtype, n_views=model_n_views(draft_model))
        self._dcache["len"] = jnp.zeros((max_batch,), jnp.int32)

        # fused single-dispatch draft admission (mirrors the target's)
        def _d_finish(d, pc, slot, t0):
            d = dict(d)
            for key in d_keys:
                d[key] = d[key].at[:, slot].set(
                    pc[key][:, 0].astype(d[key].dtype))
            d["len"] = d["len"].at[slot].set(t0)
            return d

        def _d_adm_exact(params, d, prompt, slot):
            _, pc = prefill(self.draft_model, params, prompt)
            return _d_finish(d, pc, slot, prompt.shape[1])

        def _d_adm_padded(params, d, prompt, t0, slot):
            _, pc = prefill_padded(self.draft_model, params, prompt, t0)
            return _d_finish(d, pc, slot, t0)

        donate = (1,)
        self._d_adm_exact_fn = jax.jit(_d_adm_exact, donate_argnums=donate)
        self._d_adm_padded_fn = jax.jit(_d_adm_padded,
                                        donate_argnums=donate)

        gamma_ = gamma

        def _spec(tp, dp, tc, dc, tokens):
            def dstep(carry, _):
                tok, c = carry
                logits, c = decode_step_rows(
                    self.draft_model, dp, c, tok, c["len"])
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                return (nxt, c), nxt

            (d_last, dc2), drafts = jax.lax.scan(
                dstep, (tokens, dc), None, length=gamma_)
            drafts = drafts.transpose(1, 0)  # (B, gamma)
            # Unconditional extra draft step so rows that accept everything
            # have d_{gamma-1}'s K/V; rows that don't just get a garbage row
            # past their rolled-back len, overwritten on their next write.
            _, dc3 = decode_step_rows(
                self.draft_model, dp, dc2, d_last, dc2["len"])

            chunk = jnp.concatenate([tokens[:, None], drafts], axis=1)
            logits, tc2 = decode_chunk_rows(
                self.model, tp, tc, chunk, tc["len"])
            tpred = jnp.argmax(logits, -1).astype(jnp.int32)  # (B, gamma+1)

            match = (tpred[:, :gamma_] == drafts).astype(jnp.int32)
            n_acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # (B,)
            i = jnp.arange(gamma_ + 1)[None, :]
            d_ext = jnp.concatenate([drafts, drafts[:, -1:]], axis=1)
            corr = jnp.take_along_axis(tpred, n_acc[:, None], axis=1)
            emit = jnp.where(i < n_acc[:, None], d_ext, corr)

            tc2 = dict(tc2, len=tc["len"] + n_acc + 1)
            dc3 = dict(dc3, len=dc["len"] + n_acc + 1)
            # logprob extras for every candidate position; the host emits
            # only the first n_acc+1 per row — the target's distribution at
            # position j given prefix+emit[:j], identical to what the plain
            # engine would record for the same tokens
            return (emit, n_acc, tc2, dc3, corr[:, 0]) + \
                self._lp_of(logits, emit)

        self._spec_fn = jax.jit(_spec)

    def submit(self, prompt, max_new_tokens: int,
               temperature: Optional[float] = None,
               top_k: Optional[int] = None,
               top_p: Optional[float] = None,
               eos_id: Optional[int] = None,
               min_p: Optional[float] = None,
               repetition_penalty: Optional[float] = None,
               presence_penalty: Optional[float] = None,
               frequency_penalty: Optional[float] = None,
               logit_bias: Optional[dict] = None,
               stop=None, adapter: Optional[str] = None,
               constraint=None, seed: Optional[int] = None) -> int:
        """Greedy-only: speculative verification compares the target's
        argmax against the draft's (and penalties, logit bias, or a
        constraint mask would change the argmax per emitted position,
        breaking draft/verify agreement; a per-request adapter would
        change the target while the draft stays fixed), so per-request
        overrides other than ``eos_id`` and ``stop`` (host-side suffix
        matching, decode-semantics-neutral) are rejected. ``seed`` is
        accepted and ignored: greedy decode is already deterministic."""
        if temperature not in (None, 0, 0.0) or top_k is not None or \
                top_p not in (None, 1.0) or min_p not in (None, 0.0) or \
                repetition_penalty not in (None, 1.0) or \
                presence_penalty not in (None, 0.0) or logit_bias or \
                frequency_penalty not in (None, 0.0) or \
                adapter is not None or constraint is not None:
            raise ValueError(
                "SpecDecodeEngine is greedy-only; per-request temperature/"
                "top_k/top_p/min_p/penalties/logit_bias/adapter/constraint "
                "are not supported (use DecodeEngine)")
        return super().submit(prompt, max_new_tokens, eos_id=eos_id,
                              stop=stop)

    def _on_admit(self, slot: int, prompt: np.ndarray) -> None:
        padded = self._bucket_pad(prompt)
        if padded is not None:
            self._dcache = self._d_adm_padded_fn(
                self.draft_params, self._dcache, padded[0],
                np.int32(padded[1]), np.int32(slot))
        else:
            self._dcache = self._d_adm_exact_fn(
                self.draft_params, self._dcache, prompt[None, :],
                np.int32(slot))

    def step(self) -> Dict[int, List[int]]:
        """One engine iteration: admit, retire rows whose next speculative
        round would overflow the window, then advance every live row by
        1..gamma+1 tokens with one draft scan + one target verify."""
        self.engine_steps += 1
        emitted: Dict[int, List[int]] = {}

        while self._queue:
            adm = self._admit_one()
            if adm is None:
                break
            self._emit_token(emitted, *adm)

        lens_h = np.asarray(self._cache["len"])
        for s, rid in enumerate(self._slot_rid):
            if rid >= 0 and int(lens_h[s]) + self.gamma + 1 > self.block_size:
                self._slot_rid[s] = -1
                self._done[rid] = True

        active = [s for s, r in enumerate(self._slot_rid) if r >= 0]
        if active:
            (emit_t, n_acc, self._cache, self._dcache, nxt,
             *lpx) = self._spec_fn(
                self.params, self.draft_params, self._cache, self._dcache,
                self._tokens)
            mask = np.zeros((self.max_batch,), bool)
            mask[active] = True
            zeros = jnp.zeros((self.max_batch,), jnp.int32)
            jmask = jnp.asarray(mask)
            self._cache["len"] = jnp.where(jmask, self._cache["len"], zeros)
            self._dcache["len"] = jnp.where(
                jmask, self._dcache["len"], zeros)
            self._tokens = nxt
            et, na, lens, *lph = jax.device_get(
                (emit_t, n_acc, self._cache["len"], *lpx))
            lp_h, tv_h, ti_h = lph if self.logprobs_topk \
                else (None, None, None)
            for s in active:
                rid = self._slot_rid[s]
                n_emit = int(na[s]) + 1
                base_len = int(lens[s]) - n_emit
                for j in range(n_emit):
                    lp = (self._lp_entry(lp_h[s], tv_h[s], ti_h[s], j)
                          if self.logprobs_topk else None)
                    if not self._emit_token(emitted, s, rid, int(et[s, j]),
                                            base_len + j + 1, lp):
                        break
        return emitted
