"""Paged KV cache for the serving engine (vLLM-style block tables).

The dense ``DecodeEngine`` reserves a full ``block_size``-row KV slab per
slot, so cache HBM = ``max_batch x block_size`` rows even when every live
request is short. This module virtualizes that: K/K2/V live in a pool of
fixed-size PAGES, each slot holds a page table, pages are allocated lazily
as a request's sequence grows and freed at retirement — so concurrency is
bounded by the pool's page count (tokens actually resident), not by
``max_batch x block_size``. When the pool runs dry mid-decode the engine
PREEMPTS the youngest request (frees its pages, re-queues it; its tokens
re-prefill exactly on re-admission — position state depends only on the
token prefix, so greedy results are unchanged), which is the vLLM recovery
policy adapted to XLA's static shapes.

Shapes stay fixed for jit: the page table is (max_batch, pages_per_slot)
and the per-step gather materializes each row's table-ordered KV window at
``block_size`` width, masked by per-row lengths — identical math to
``decode_step_rows`` (token equality pinned in tests/test_serving_paged.py,
including under forced preemption). What paging buys on TPU is cache
MEMORY (over-subscription: serve more concurrent requests than dense slabs
would fit), not bandwidth — the gather reads the same bytes; the honest
accounting is in ``cache_bytes()`` / ``benchmarks/serving.md``.

The reference has no serving stack at all (SURVEY §0); scope matches
``DecodeEngine`` (TinyTransformerLM base + quartet, and GPT_MoP — the
gate's per-layer view history pages with the same tables as the KV rows),
greedy or per-request sampling. Prefix cache and speculative decoding
remain dense-engine features.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.generate import _attn_step, _kv_rows, _lin, _ln, _mop_gates, \
    model_n_views, prefill, prefill_padded
from ..models.layers import gelu_tanh
from .engine import DecodeEngine

Array = jax.Array


def init_paged_pool(config, n_pages: int, page_size: int,
                    dtype=jnp.float32, n_views: int = 0) -> dict:
    """K/K2/V page pools of shape (L, n_pages + 1, H, page_size, dk).

    Physical page 0 is the SCRATCH page: every unallocated page-table entry
    points at it, so inactive/garbage rows write there harmlessly and the
    fixed-shape gather always reads valid indices. Usable pages are
    1..n_pages.

    ``n_views > 0`` (GPT_MoP): adds an ``mv`` view-history pool of shape
    (L, n_pages + 1, page_size, V) — the gate conv's tap source, paged
    with the same tables as the KV rows."""
    L, h = config.n_layer, config.n_head
    dk = config.n_embd // h
    shape = (L, n_pages + 1, h, page_size, dk)
    pool = {"k": jnp.zeros(shape, dtype), "k2": jnp.zeros(shape, dtype),
            "v": jnp.zeros(shape, dtype)}
    if n_views:
        pool["mv"] = jnp.zeros((L, n_pages + 1, page_size, n_views),
                               jnp.float32)
    return pool


def paged_decode_step_rows(model, params, pool, table, tokens, lens):
    """Advance every row one token against PAGED caches.

    table: (B, P) int32 physical page ids (unallocated entries = scratch 0).
    tokens/lens: (B,) as in ``decode_step_rows``. Returns
    (logits (B, vocab), new pool). Row b's new K/K2/V land in page
    ``table[b, lens[b] // page_size]`` at offset ``lens[b] % page_size``
    (the engine guarantees that page is allocated); attention runs over the
    table-ordered ``P * page_size``-wide window masked to ``lens[b] + 1``
    live columns — exactly ``decode_step_rows``'s math with the window
    assembled by gather instead of resident per-slot."""
    cfg = model.config
    p = params["params"]
    b = tokens.shape[0]
    ps = pool["k"].shape[3]
    n_valid = lens + 1
    x = p["wte"]["embedding"][tokens][:, None, :]
    if cfg.use_abs_pos_emb:
        x = x + p["wpe"]["embedding"][lens][:, None, :]

    page_ids = jnp.take_along_axis(table, (lens // ps)[:, None], 1)[:, 0]
    off = lens % ps
    h_ = cfg.n_head
    dk = cfg.n_embd // h_

    def gather(buf_i):
        # (n_pages+1, H, ps, dk)[table] -> (B, P, H, ps, dk) -> (B, H, P*ps, dk)
        g = buf_i[table]
        bsz, pmax = table.shape
        return g.transpose(0, 2, 1, 3, 4).reshape(bsz, h_, pmax * ps, dk)

    new = dict(pool)
    for i in range(cfg.n_layer):
        bp = p[f"blocks_{i}"]
        h = _ln(x, bp["ln1"])
        k_new, k2_new, v_new = _kv_rows(bp["attn"], cfg, h)  # (B, H, 1, dk)
        wr = lambda buf, row: buf.at[i, page_ids, :, off, :].set(
            row[:, :, 0, :].astype(buf.dtype))
        new["k"] = wr(new["k"], k_new)
        new["k2"] = wr(new["k2"], k2_new)
        new["v"] = wr(new["v"], v_new)
        a = _attn_step(bp["attn"], cfg, h, gather(new["k"][i]),
                       gather(new["k2"][i]), gather(new["v"][i]), n_valid)
        x = x + a
        if "views" in bp:  # GPT_MoP gate: write the view row into its
            # page, assemble the table-ordered history, tap at `lens`
            v_row = _lin(x, bp["views"]["proj"])  # (B, 1, V)
            new["mv"] = new["mv"].at[i, page_ids, off, :].set(
                v_row[:, 0, :].astype(new["mv"].dtype))
            bsz, pmax = table.shape
            mv_rows = new["mv"][i][table].reshape(bsz, pmax * ps, -1)
            gate = _mop_gates(bp, mv_rows, lens,
                              bool(getattr(model, "causal_gate", False)))
            x = x * gate[..., None]
        hm = _ln(x, bp["ln2"])
        x = x + _lin(gelu_tanh(_lin(hm, bp["mlp"]["fc"])), bp["mlp"]["proj"])

    x = _ln(x, p["ln_f"])
    logits = (x @ p["wte"]["embedding"].T)[:, 0, :]
    return logits, new


class PagedDecodeEngine(DecodeEngine):
    """Continuous batching over a PAGED KV pool with preemption.

    >>> eng = PagedDecodeEngine(model, params, max_batch=8,
    ...                         n_pages=48, page_size=16)
    >>> rid = eng.submit([5, 17, 3], max_new_tokens=32)
    >>> eng.run()

    Cache HBM is ``n_pages x page_size`` token rows regardless of
    ``max_batch`` (vs the dense engine's ``max_batch x block_size``) —
    see :meth:`cache_bytes`. Requires ``n_pages >= block_size /
    page_size`` so a maximal single request always fits; preemption
    (youngest-first) guarantees the oldest request progresses.
    ``preemptions`` / ``pages_in_use`` / ``peak_pages_in_use`` expose the
    accounting."""

    def __init__(self, model, params, max_batch: int = 8,
                 n_pages: int = 64, page_size: int = 16,
                 eos_id: Optional[int] = None, temperature: float = 0.0,
                 top_k: Optional[int] = None, top_p: Optional[float] = None,
                 rng: Optional[Array] = None,
                 prefill_buckets: Optional[Sequence[int]] = None,
                 kv_dtype=jnp.float32,
                 min_p: float = 0.0, repetition_penalty: float = 1.0,
                 presence_penalty: float = 0.0,
                 frequency_penalty: float = 0.0,
                 adapters=None, adapter_scale=1.0,
                 logprobs_topk: int = 0):
        cfg = model.config
        if cfg.block_size % page_size != 0:
            raise ValueError(
                f"page_size {page_size} must divide block_size "
                f"{cfg.block_size}")
        self.page_size = page_size
        self.pages_per_slot = cfg.block_size // page_size
        if n_pages < self.pages_per_slot:
            raise ValueError(
                f"n_pages {n_pages} < pages_per_slot {self.pages_per_slot}:"
                f" a full-window request could never fit; preemption could "
                f"not guarantee progress")
        self.n_pages = n_pages
        super().__init__(model, params, max_batch=max_batch, eos_id=eos_id,
                         temperature=temperature, top_k=top_k, top_p=top_p,
                         rng=rng, prefill_buckets=prefill_buckets,
                         kv_dtype=kv_dtype, min_p=min_p,
                         repetition_penalty=repetition_penalty,
                         presence_penalty=presence_penalty,
                         frequency_penalty=frequency_penalty,
                         adapters=adapters, adapter_scale=adapter_scale,
                         logprobs_topk=logprobs_topk)
        # the page pool replaces the dense slot slabs (which _make_cache
        # below prevents from ever being allocated)
        self._pool = init_paged_pool(cfg, n_pages, page_size, kv_dtype,
                                     n_views=model_n_views(model))
        self._free: List[int] = list(range(n_pages, 0, -1))  # stack; 0=scratch
        self._table = np.zeros((max_batch, self.pages_per_slot), np.int32)
        self._n_alloc = np.zeros((max_batch,), np.int32)  # pages per slot
        self._lens = np.zeros((max_batch,), np.int32)
        self._slot_prompt: List[Optional[np.ndarray]] = [None] * max_batch
        # results[rid] length at admission: tokens past this index were
        # generated since the (re-)admitted prefix (preemption bookkeeping)
        self._slot_res_base = np.zeros((max_batch,), np.int64)
        self.preemptions = 0
        self.peak_pages_in_use = 0

        def _step(params_, pool, table, tokens, lens, rng_, seeds, ntoks,
                  temp, topk, topp, minp, rep, pres, freq, ocounts, pseen,
                  lbias, adv):
            """``adv``: (B,) bool — rows advancing this step. Held rows
            (inactive slots; constrained rows that just sat out a burst
            whose follow-up single step this is; rows that took the
            burst) keep token/penalty state via ``where`` — their
            garbage K/V write at the held position is overwritten by
            their next real step (lengths are host-managed here and
            only advance for ``adv`` rows)."""
            logits, new = paged_decode_step_rows(
                self.model, params_, pool, table, tokens, lens)
            nxt = self._pick_rows(logits, rng_, temp, topk, topp, minp,
                                  rep, pres, freq, ocounts, pseen, lbias,
                                  seeds=seeds, ntoks=ntoks)
            nxt = jnp.where(adv, nxt, tokens)
            ocounts = ocounts.at[jnp.arange(ocounts.shape[0]), nxt].add(
                adv.astype(jnp.int32))
            return (nxt, new, ocounts) + self._lp_of(logits, nxt)

        self._pstep_fn = jax.jit(_step, donate_argnums=(1, 15))

        def _pmstep(params_, pool, table, tokens, lens, rng_, seeds,
                    ntoks, temp, topk, topp, minp, rep, pres, freq,
                    ocounts, pseen, lbias, elig, k_steps):
            """k paged decode steps in ONE dispatch (multi-step
            scheduling over the page pool): rng split, picker, penalty
            counts, and seeded positions advance per inner step exactly
            as k single steps would (equality pinned in
            tests/test_serving_paged_multistep.py). ``elig`` rows
            advance; held rows' token/length/counts are pinned via
            ``where``. The engine pre-allocates every page an eligible
            row's burst will write (``_paged_multi_k``), so in-window
            writes always land in owned pages; a row that retires
            mid-burst keeps advancing on-device — its post-window
            writes hit either the scratch page (unallocated table
            entries) or its own retiring row (clipped table gather),
            never a co-tenant's pages."""
            b = tokens.shape[0]

            def body(carry, _):
                pool, tokens, lens, rng_, ocounts, ntoks = carry
                logits, pool = paged_decode_step_rows(
                    self.model, params_, pool, table, tokens, lens)
                rng_, sub = jax.random.split(rng_)
                nxt = self._pick_rows(logits, sub, temp, topk, topp,
                                      minp, rep, pres, freq, ocounts,
                                      pseen, lbias, seeds=seeds,
                                      ntoks=ntoks)
                nxt = jnp.where(elig, nxt, tokens)
                ocounts = ocounts.at[jnp.arange(b), nxt].add(
                    elig.astype(jnp.int32))
                lens = jnp.where(elig, lens + 1, lens)
                out = (nxt,) + self._lp_of(logits, nxt)
                return (pool, nxt, lens, rng_, ocounts, ntoks + 1), out

            carry, outs = jax.lax.scan(
                body, (pool, tokens, lens, rng_, ocounts, ntoks), None,
                length=k_steps)
            pool, tokens, _, rng_, ocounts, _ = carry
            return (pool, tokens, rng_, ocounts) + tuple(outs)

        self._pmstep_fn = jax.jit(_pmstep, static_argnums=(19,),
                                  donate_argnums=(1, 15))

        npb = self.pages_per_slot

        def _padm_finish(pool, pc, logits, pages, tokens, slot, rng_, sp,
                         sd, oc, seen, lb):
            # Slice the prefill's full-width rows into the allocated pages.
            # ``pages`` is always the full (pages_per_slot,) row — entries
            # past the allocation point at scratch page 0, whose duplicate
            # garbage writes are harmless by design — so admission compiles
            # once per prefill bucket, NOT once per page count.
            for key in self._pool_keys:
                rows = pc[key][:, 0]  # (L, H, block, dk) / mv: (L, block, V)
                pool = dict(pool)
                if key == "mv":
                    L, _, V = rows.shape
                    chunk = rows.reshape(L, npb, page_size, V)
                else:
                    L, H, _, dk = rows.shape
                    chunk = rows.reshape(L, H, npb, page_size, dk)
                    chunk = chunk.transpose(0, 2, 1, 3, 4)  # (L,npb,H,ps,dk)
                pool[key] = pool[key].at[:, pages].set(
                    chunk.astype(pool[key].dtype))
            r1 = lambda x: jnp.reshape(x, (1,))
            tok0 = self._pick_rows(
                logits, rng_, r1(sp[0]), r1(sp[1]), r1(sp[2]),
                r1(sp[3]), r1(sp[4]), r1(sp[5]), r1(sp[6]), oc, seen,
                lb, seeds=sd[:1], ntoks=sd[1:2])[0]
            tokens = tokens.at[slot].set(tok0)
            return (pool, tokens, tok0) + self._lp_of(
                logits, jnp.reshape(tok0, (1,)))

        def _padm_exact(params_, pool, tokens, prompt, pages, slot, rng_,
                        sp, sd, oc, seen, lb):
            logits, pc = prefill(self.model, params_, prompt)
            return _padm_finish(pool, pc, logits, pages, tokens, slot, rng_,
                                sp, sd, oc, seen, lb)

        def _padm_padded(params_, pool, tokens, prompt, t0, pages, slot,
                         rng_, sp, sd, oc, seen, lb):
            logits, pc = prefill_padded(self.model, params_, prompt, t0)
            return _padm_finish(pool, pc, logits, pages, tokens, slot, rng_,
                                sp, sd, oc, seen, lb)

        self._padm_exact_fn = jax.jit(_padm_exact, donate_argnums=(1, 2))
        self._padm_padded_fn = jax.jit(_padm_padded, donate_argnums=(1, 2))

    def _make_cache(self, cfg, max_batch, kv_dtype, cache_sharding):
        """No dense slabs: the whole point of paging is that the
        ``max_batch x block_size`` reservation never exists."""
        return None

    # ---------------- accounting ----------------

    @property
    def pages_in_use(self) -> int:
        return self.n_pages - len(self._free)

    def cache_bytes(self) -> int:
        """Actual cache HBM held by this engine (page pools incl. scratch)."""
        return sum(int(buf.size) * buf.dtype.itemsize
                   for buf in self._pool.values())

    def dense_equivalent_bytes(self) -> int:
        """What the dense engine's slot slabs would hold at this
        ``max_batch`` (the over-subscription comparison)."""
        cfg = self.model.config
        dk = cfg.n_embd // cfg.n_head
        per = cfg.n_layer * self.max_batch * cfg.n_head * cfg.block_size * dk
        return 3 * per * jnp.dtype(self.kv_dtype).itemsize

    # ---------------- page bookkeeping (host) ----------------

    def _alloc_page(self) -> Optional[int]:
        if not self._free:
            return None
        pg = self._free.pop()
        self.peak_pages_in_use = max(self.peak_pages_in_use,
                                     self.pages_in_use)
        return pg

    def _free_slot_pages(self, slot: int) -> None:
        n = int(self._n_alloc[slot])
        for j in range(n):
            self._free.append(int(self._table[slot, j]))
        self._table[slot] = 0
        self._n_alloc[slot] = 0
        self._lens[slot] = 0
        self._slot_prompt[slot] = None

    def _reclaim_retired(self) -> None:
        for s in range(self.max_batch):
            if self._slot_rid[s] < 0 and self._n_alloc[s] > 0:
                self._free_slot_pages(s)

    def _preempt_slot(self, victim: int) -> None:
        """Evict ``victim``: free its pages and push it back on the queue
        FRONT with its full token prefix (original prompt + tokens emitted
        so far) and remaining budget. Re-admission re-prefills that prefix
        — position state depends only on the prefix, so greedy
        continuation is exact."""
        rid = self._slot_rid[victim]
        sp = (np.float32(self._slot_temp[victim]),
              np.int32(self._slot_topk[victim]),
              np.float32(self._slot_topp[victim]),
              np.int64(self._slot_eos[victim]),
              np.float32(self._slot_minp[victim]),
              np.float32(self._slot_rep[victim]),
              np.float32(self._slot_pres[victim]),
              np.float32(self._slot_freq[victim]))
        new_toks = self._results[rid][int(self._slot_res_base[victim]):]
        prefix = np.concatenate([
            self._slot_prompt[victim],
            np.asarray(new_toks, np.int32)])
        self._queue.appendleft(
            (rid, prefix.astype(np.int32), int(self._budget[victim]), sp,
             self._slot_bias[victim], self._slot_stops[victim],
             int(self._slot_adapter[victim]),
             self._slot_constraint[victim],
             int(self._slot_seed[victim]), None, 1.0))
        self._slot_rid[victim] = -1
        self._slot_constraint[victim] = None
        self._slot_cstate[victim] = None
        self._free_slot_pages(victim)
        self.preemptions += 1

    def _preempt_for(self, needy: int) -> None:
        """Free pages so slot ``needy`` (or the queue, after ``needy``
        itself is evicted) can progress. Victims must be RE-ADMISSIBLE:
        a slot whose token prefix already fills the whole context window
        (``lens + 1 == block_size`` — one emission from retiring) cannot
        be re-prefilled, so it is skipped; youngest eligible first. If no
        other slot is eligible, ``needy`` evicts ITSELF (always
        re-admissible: a slot needing a growth page has
        ``lens < block_size - page_size + 1``) — the remaining full-window
        slots retire within one step and the queue drains after them."""
        cands = [s for s in range(self.max_batch)
                 if s != needy and self._slot_rid[s] >= 0
                 and int(self._lens[s]) + 1 < self.block_size]
        if cands:
            self._preempt_slot(max(cands, key=lambda s: self._slot_rid[s]))
        else:
            self._preempt_slot(needy)

    def _ensure_growth_pages(self) -> None:
        """Every active row writes its next K/V at position ``lens``; make
        sure that page exists, preempting youngest-first when the pool is
        dry."""
        for s in range(self.max_batch):
            if self._slot_rid[s] < 0:
                continue
            need = int(self._lens[s]) // self.page_size
            while self._slot_rid[s] >= 0 and need >= int(self._n_alloc[s]):
                pg = self._alloc_page()
                if pg is None:
                    self._preempt_for(s)  # may evict s itself
                    continue
                self._table[s, int(self._n_alloc[s])] = pg
                self._n_alloc[s] += 1

    # ---------------- admission ----------------

    def _admit_one(self) -> Optional[Tuple[int, int, int, int]]:
        try:
            slot = self._slot_rid.index(-1)
        except ValueError:
            return None
        if not self._queue:
            return None
        self._reclaim_retired()
        (rid, prompt, max_new, sp, bias_row, stops, aid, con, seed,
         _nb, _lpen) = self._queue[0]
        t0 = int(prompt.size)
        # pages covering positions 0..t0 (t0 = where tok0's K lands next)
        n_need = t0 // self.page_size + 1
        if n_need > len(self._free):
            return None  # wait for retirements; actives always drain
        self._queue.popleft()
        pages = [self._alloc_page() for _ in range(n_need)]
        self._table[slot, :] = 0
        self._table[slot, :n_need] = pages
        self._n_alloc[slot] = n_need
        self._lens[slot] = t0
        self._slot_prompt[slot] = prompt.copy()
        self._slot_res_base[slot] = len(self._results[rid])
        (self._slot_temp[slot], self._slot_topk[slot],
         self._slot_topp[slot], self._slot_eos[slot],
         self._slot_minp[slot], self._slot_rep[slot],
         self._slot_pres[slot], self._slot_freq[slot]) = sp
        self._slot_bias[slot] = bias_row
        self._slot_stops[slot] = stops
        self._set_slot_adapter(slot, aid)
        self._slot_constraint[slot] = con
        self._slot_cstate[slot] = self._replay_constraint(con, rid)
        brow = self._bias_mask_row(slot)
        lb = jnp.zeros((1, self._vocab), jnp.float32) if brow is None \
            else jnp.asarray(brow)[None]
        self._lbias = self._lbias.at[slot].set(lb[0])
        spk = (sp[0], sp[1], sp[2], sp[4], sp[5], sp[6], sp[7])
        # penalty state: output counts from tokens already emitted for this
        # rid (re-prefilled prefixes after preemption keep their penalty
        # history), prompt membership from the queued prefix
        oc = np.zeros((1, self._vocab), np.int32)
        prev = self._results[rid]
        if prev:
            np.add.at(oc[0], np.asarray(prev, np.int64), 1)
        seen = np.zeros((1, self._vocab), bool)
        seen[0, prompt] = True
        oc_j, seen_j = jnp.asarray(oc), jnp.asarray(seen)
        self._slot_seed[slot] = seed
        self._slot_ntok[slot] = len(self._results[rid])
        sd = np.asarray([seed, self._slot_ntok[slot]], np.int32)
        self._rng, sub = jax.random.split(self._rng)
        # full-width page row (scratch-padded) -> one compile per bucket
        pages_full = np.zeros((self.pages_per_slot,), np.int32)
        pages_full[:n_need] = pages
        pages_j = jnp.asarray(pages_full)
        padded = self._bucket_pad(prompt)
        if padded is not None:
            self._pool, self._tokens, tok0, *lpx = self._padm_padded_fn(
                self._admit_params(aid), self._pool, self._tokens,
                padded[0], np.int32(padded[1]), pages_j, np.int32(slot),
                sub, spk, sd, oc_j, seen_j, lb)
        else:
            self._pool, self._tokens, tok0, *lpx = self._padm_exact_fn(
                self._admit_params(aid), self._pool, self._tokens,
                prompt[None, :], pages_j, np.int32(slot), sub, spk, sd,
                oc_j, seen_j, lb)
        lp0 = None
        if self.logprobs_topk:
            # one fetch for tok0 + extras (a second device_get would be a
            # second dispatch round-trip)
            tok0, lp_h, tv_h, ti_h = jax.device_get((tok0, *lpx))
            lp0 = self._lp_entry(lp_h, tv_h, ti_h, 0)
        tok0 = int(tok0)
        self._ocounts = self._ocounts.at[slot].set(oc_j[0].at[tok0].add(1))
        self._pseen = self._pseen.at[slot].set(seen_j[0])
        self._slot_rid[slot] = rid
        self._budget[slot] = max_new
        return slot, rid, tok0, t0, lp0

    # ---------------- engine loop ----------------

    def step(self, n_tokens: int = 1) -> Dict[int, List[int]]:
        """One engine iteration (see ``DecodeEngine.step``). ``n_tokens
        > 1``: MULTI-STEP decoding over the page pool — up to n_tokens
        paged decode steps in ONE dispatch, with every page the burst
        writes PRE-allocated host-side (``_paged_multi_k``; the free
        pool bounds the safe k the way window headroom does in the
        dense engine — preemption never happens inside a burst, and if
        the pool cannot cover even k=2 the step falls back to single
        steps, which may preempt). Token-identical to n_tokens single
        steps (tests/test_serving_paged_multistep.py). Constrained
        requests sit the burst out per-slot and advance one token via a
        follow-up single step in the same call."""
        self.engine_steps += 1
        emitted: Dict[int, List[int]] = {}
        self._reclaim_retired()

        while self._queue:
            adm = self._admit_one()
            if adm is None:
                break
            if not self._emit_token(emitted, *adm):
                self._reclaim_retired()

        active = [s for s, r in enumerate(self._slot_rid) if r >= 0]
        if active:
            self._ensure_growth_pages()
            # preemption may have retired slots; refresh
            active = [s for s, r in enumerate(self._slot_rid) if r >= 0]
        if active and n_tokens > 1:
            k, elig = self._paged_multi_k(n_tokens, active)
            if k > 1:
                self._paged_step_multi(elig, k, emitted)
                elig_set = set(elig)
                # constrained co-tenants advance one token below
                active = [s for s in active if s not in elig_set
                          and self._slot_rid[s] >= 0]
        if active:
            adv = np.zeros((self.max_batch,), bool)
            adv[active] = True
            self._rng, sub = jax.random.split(self._rng)
            lens_j = jnp.asarray(self._lens)
            nxt, self._pool, self._ocounts, *lpx = self._pstep_fn(
                self._step_params(), self._pool, jnp.asarray(self._table),
                self._tokens, lens_j, sub,
                jnp.asarray(self._slot_seed.astype(np.int32)),
                jnp.asarray(self._slot_ntok.astype(np.int32)),
                jnp.asarray(self._slot_temp),
                jnp.asarray(self._slot_topk), jnp.asarray(self._slot_topp),
                jnp.asarray(self._slot_minp), jnp.asarray(self._slot_rep),
                jnp.asarray(self._slot_pres), jnp.asarray(self._slot_freq),
                self._ocounts, self._pseen, self._lbias,
                jnp.asarray(adv))
            self._tokens = nxt
            toks, *lph = jax.device_get((nxt, *lpx))
            lp_h, tv_h, ti_h = lph if self.logprobs_topk \
                else (None, None, None)
            # lengths are host-managed: only advancing rows move (held
            # rows — e.g. slots that took the burst above — keep theirs;
            # every retire path zeroes via _free_slot_pages)
            for s in active:
                self._lens[s] += 1
            for s in active:
                lp = (self._lp_entry(lp_h, tv_h, ti_h, s)
                      if self.logprobs_topk else None)
                if not self._emit_token(emitted, s, self._slot_rid[s],
                                        int(toks[s]), int(self._lens[s]),
                                        lp):
                    self._free_slot_pages(s)
        return emitted

    def _paged_multi_k(self, n_tokens: int, active):
        """Burst size + eligible slots for paged multi-step decoding.

        Per-slot eligibility as in ``DecodeEngine._multi_k``:
        constrained slots sit out (DFA mask updates between tokens); k
        caps at the LARGEST eligible headroom so a row near retirement
        retires mid-burst instead of collapsing co-tenants to k=1.

        The paged-specific bound: every page an eligible row's burst
        will write must be allocatable NOW (positions ``lens ..
        min(lens+k, lens+budget, block)-1``) — k shrinks until the free
        pool covers the pre-allocation, so no preemption can be needed
        mid-burst. On success the pages are allocated here and ``(k,
        elig)`` returned; ``(1, None)`` falls back to the single-step
        path (which may preempt)."""
        elig = [s for s in active if self._slot_constraint[s] is None]
        if not elig:
            return 1, None
        bs = self.block_size
        headroom = max(min(int(self._budget[s]), bs - int(self._lens[s]))
                       for s in elig)
        k = min(int(n_tokens), max(headroom, 1))
        while k > 1 and self._burst_page_need(elig, k) > len(self._free):
            k -= 1
        if k <= 1:
            return 1, None
        for s in elig:
            need = self._burst_last_pos(s, k) // self.page_size + 1
            while int(self._n_alloc[s]) < need:
                pg = self._alloc_page()  # guaranteed by the k loop above
                self._table[s, int(self._n_alloc[s])] = pg
                self._n_alloc[s] += 1
        return k, elig

    def _burst_last_pos(self, s: int, k: int) -> int:
        """Highest in-window position slot ``s`` writes during a
        k-burst (it retires at its budget/window edge; later in-scan
        writes land on scratch or clip into its own retiring row)."""
        return min(int(self._lens[s]) + k,
                   int(self._lens[s]) + int(self._budget[s]),
                   self.block_size) - 1

    def _burst_page_need(self, elig, k: int) -> int:
        """Free pages a k-burst would consume across ``elig`` slots."""
        ps = self.page_size
        return sum(max(0, self._burst_last_pos(s, k) // ps + 1
                       - int(self._n_alloc[s]))
                   for s in elig)

    def _paged_step_multi(self, elig, k: int, emitted) -> None:
        """k paged decode steps in one dispatch + host emission (see
        ``step``; mirrors ``DecodeEngine._step_multi``)."""
        emask = np.zeros((self.max_batch,), bool)
        emask[elig] = True
        lens0 = self._lens.copy()
        out = self._pmstep_fn(
            self._step_params(), self._pool, jnp.asarray(self._table),
            self._tokens, jnp.asarray(self._lens), self._rng,
            jnp.asarray(self._slot_seed.astype(np.int32)),
            jnp.asarray(self._slot_ntok.astype(np.int32)),
            jnp.asarray(self._slot_temp),
            jnp.asarray(self._slot_topk), jnp.asarray(self._slot_topp),
            jnp.asarray(self._slot_minp), jnp.asarray(self._slot_rep),
            jnp.asarray(self._slot_pres), jnp.asarray(self._slot_freq),
            self._ocounts, self._pseen, self._lbias, jnp.asarray(emask),
            k)
        self._pool, self._tokens, self._rng, self._ocounts = out[:4]
        toks_k = out[4]
        lpx = out[5:]
        toks_h, *lph = jax.device_get((toks_k, *lpx))  # one fetch
        live = set(elig)
        for j in range(k):
            for s in list(live):
                rid = self._slot_rid[s]
                lp = (self._lp_entry(lph[0][j], lph[1][j], lph[2][j], s)
                      if self.logprobs_topk else None)
                if not self._emit_token(emitted, s, rid,
                                        int(toks_h[j, s]),
                                        int(lens0[s]) + j + 1, lp):
                    live.discard(s)  # retired mid-burst: later burst
                    self._free_slot_pages(s)  # tokens are discarded
        for s in live:
            self._lens[s] = lens0[s] + k

    def cancel(self, rid: int) -> bool:
        ok = super().cancel(rid)
        if ok:
            self._reclaim_retired()
        return ok
