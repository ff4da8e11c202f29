"""Continuous-batching transcription serving for Whisper-MoP.

The GPT engines (``engine.py``/``paged.py``) cover text generation; this
module serves the third model family: audio requests are admitted into a
fixed slot pool (one encoder pass + cross-attention K/V computed once per
request), and ONE fixed-shape jitted decode step advances every live
transcription by a token per call — requests at different decode positions
batch together, admitted/retired independently (continuous batching).

Unlike the GPT family the Whisper decoder is a standard causal transformer
(reference ``mop/models/whisper_mop.py:251-269``), so the KV cache is
EXACT: the engine's streams are pinned token-equal to the single-stream
``whisper_transcribe_cached`` sampler in tests/test_serving_whisper.py,
including staggered mid-flight admission.

The reference has no decode loop at all for Whisper (SURVEY §0 — its
WhisperMoP computes teacher-forced logits only).
"""

from __future__ import annotations

from collections import deque
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.generate import _lin, _ln
from ..models.layers import gelu_tanh

Array = jax.Array


def _mha_rows(q, ks, vs, n_valid=None):
    """q: (B,H,1,dh) vs ks/vs (B,H,T,dh); ``n_valid``: per-row (B,) live
    lengths (None = attend everywhere — the cross-attention case)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, ks.astype(q.dtype)) / jnp.sqrt(
        q.shape[-1]).astype(jnp.float32)
    if n_valid is not None:
        cols = jnp.arange(ks.shape[2])[None, :] < n_valid[:, None]
        s = jnp.where(cols[:, None, None, :], s, -jnp.inf)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", a, vs.astype(a.dtype))


def whisper_decode_step_rows(model, params, cross_k, cross_v, ks, vs,
                             tokens, lens):
    """Advance every row one decoder token, each at its OWN position.

    cross_k/cross_v: (L, B, H, T_enc, dh) per-slot cross-attention memory.
    ks/vs: (L, B, H, win, dh) self-attention caches. tokens/lens: (B,).
    Returns (logits (B, vocab), new ks, new vs) with row b's new K/V at
    position ``lens[b]``. Row-independent: pinned vs the single-stream
    sampler (exact — standard causal decoder, no cross-position stats)."""
    cfg = model.cfg
    p = params["params"]
    b = tokens.shape[0]
    h = cfg.n_head
    d = cfg.n_embd
    dh = d // h
    L = cfg.n_layer_dec
    rows = jnp.arange(b)
    n_valid = lens + 1

    split1 = lambda y: y.reshape(b, 1, h, dh).transpose(0, 2, 1, 3)
    x = p["wte"]["embedding"][tokens][:, None, :]
    if cfg.use_abs_pos_emb:
        x = x + p["text_pos"]["embedding"][lens][:, None, :]

    new_ks, new_vs = ks, vs
    for li in range(L):
        bp = p[f"decoder_{li}"]
        hx = _ln(x, bp["ln1"])
        sp = bp["self_attn"]
        q = split1(_lin(hx, sp["q_proj"]))
        k_new = split1(_lin(hx, sp["k_proj"]))
        v_new = split1(_lin(hx, sp["v_proj"]))
        wr = lambda buf, row: buf.at[li, rows, :, lens, :].set(
            row[:, :, 0, :].astype(buf.dtype))
        new_ks = wr(new_ks, k_new)
        new_vs = wr(new_vs, v_new)
        y = _mha_rows(q, new_ks[li], new_vs[li], n_valid=n_valid)
        x = x + _lin(y.transpose(0, 2, 1, 3).reshape(b, 1, d), sp["o_proj"])
        cx = _ln(x, bp["ln2"])
        cp = bp["cross_attn"]
        qc = split1(_lin(cx, cp["q_proj"]))
        yc = _mha_rows(qc, cross_k[li], cross_v[li])
        x = x + _lin(yc.transpose(0, 2, 1, 3).reshape(b, 1, d),
                     cp["o_proj"])
        mx = _ln(x, bp["ln3"])
        mp = bp["mlp"]
        x = x + _lin(gelu_tanh(_lin(mx, mp["fc"])), mp["proj"])

    x = _ln(x, p["dec_ln_f"])
    logits = (x @ p["wte"]["embedding"].T)[:, 0, :]
    return logits, new_ks, new_vs


class WhisperServingEngine:
    """Continuous-batching greedy transcription over a fixed slot pool.

    >>> eng = WhisperServingEngine(model, params, max_batch=4, bos_token=1)
    >>> rid = eng.submit(mel, max_new_tokens=64)
    >>> results = eng.run()     # {rid: [tokens...]}

    Every submitted mel must have the model's ``n_audio_ctx`` frames (the
    standard Whisper fixed 30 s window). Admission runs the encoder once
    and freezes the request's cross-attention K/V into its slot; decode is
    one fixed-shape batched step per engine iteration. A request retires at
    ``max_new_tokens``, its ``eos_id``, or the text context window.
    ``kv_dtype`` stores all K/V pools in that dtype (e.g. bf16)."""

    def __init__(self, model, params, max_batch: int = 4,
                 bos_token: int = 1, eos_id: Optional[int] = None,
                 kv_dtype=jnp.float32):
        self.model = model
        self.params = params
        # The flax encoder module cannot consume int8/int4 QTensor leaves;
        # keep a dequantized copy for the one encoder pass per admission
        # (the decode loop reads quantized weights through _lin) — the same
        # split whisper_transcribe_cached makes.
        from ..ops.quant import Q4Tensor, QTensor, dequantize_params

        is_q = lambda l: isinstance(l, (QTensor, Q4Tensor))
        has_q = any(is_q(l) for l in jax.tree_util.tree_leaves(
            params, is_leaf=is_q))
        self._enc_params = dequantize_params(params) if has_q else params
        self.max_batch = max_batch
        self.bos_token = bos_token
        self.eos_id = eos_id
        cfg = model.cfg
        self.win = cfg.n_text_ctx
        self.t_enc = cfg.n_audio_ctx
        h = cfg.n_head
        dh = cfg.n_embd // h
        L = cfg.n_layer_dec
        self._ck = jnp.zeros((L, max_batch, h, self.t_enc, dh), kv_dtype)
        self._cv = jnp.zeros((L, max_batch, h, self.t_enc, dh), kv_dtype)
        self._ks = jnp.zeros((L, max_batch, h, self.win, dh), kv_dtype)
        self._vs = jnp.zeros((L, max_batch, h, self.win, dh), kv_dtype)
        self._tokens = jnp.full((max_batch,), bos_token, jnp.int32)
        self._lens = np.zeros((max_batch,), np.int32)
        self._slot_rid: List[int] = [-1] * max_batch
        self._slot_eos = np.full((max_batch,), -1, np.int64)
        self._budget = np.zeros((max_batch,), np.int64)
        self._queue: deque = deque()
        self._results: Dict[int, List[int]] = {}
        self._done: Dict[int, bool] = {}
        self._next_rid = 0
        self.tokens_generated = 0
        self.engine_steps = 0

        def _step(params_, ck, cv, ks, vs, tokens, lens):
            logits, ks2, vs2 = whisper_decode_step_rows(
                self.model, params_, ck, cv, ks, vs, tokens, lens)
            return jnp.argmax(logits, -1).astype(jnp.int32), ks2, vs2

        self._step_fn = jax.jit(_step, donate_argnums=(3, 4))

        def _mstep(params_, ck, cv, ks, vs, tokens, lens, k_steps):
            """k greedy decode steps in ONE dispatch (multi-step
            scheduling — the same amortization as DecodeEngine's
            ``step(n_tokens=k)``; greedy-only engine, so the scan is
            trivially token-identical to k single steps)."""
            def body(carry, _):
                ks, vs, tokens, lens = carry
                logits, ks, vs = whisper_decode_step_rows(
                    self.model, params_, ck, cv, ks, vs, tokens, lens)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                return (ks, vs, nxt, lens + 1), nxt

            (ks, vs, tokens, _), toks = jax.lax.scan(
                body, (ks, vs, tokens, lens), None, length=k_steps)
            return tokens, ks, vs, toks

        self._mstep_fn = jax.jit(_mstep, static_argnums=(7,),
                                 donate_argnums=(3, 4))

        def _admit(enc_params_, params_, ck, cv, mel, slot):
            # one encoder pass; freeze this request's cross K/V into `slot`
            enc_out, _ = self.model.apply(enc_params_, mel,
                                          method=self.model.encode)
            p = params_["params"]
            tk = enc_out.shape[1]
            for li in range(L):
                cp = p[f"decoder_{li}"]["cross_attn"]
                k = _lin(enc_out, cp["k_proj"]).reshape(
                    1, tk, h, dh).transpose(0, 2, 1, 3)
                v = _lin(enc_out, cp["v_proj"]).reshape(
                    1, tk, h, dh).transpose(0, 2, 1, 3)
                ck = ck.at[li, slot].set(k[0].astype(ck.dtype))
                cv = cv.at[li, slot].set(v[0].astype(cv.dtype))
            return ck, cv

        self._admit_fn = jax.jit(_admit, donate_argnums=(2, 3))

    # ---------------- public API ----------------

    def submit(self, mel, max_new_tokens: int,
               eos_id: Optional[int] = None) -> int:
        """Queue a transcription. ``mel``: (n_audio_ctx, n_mels) or
        (1, n_audio_ctx, n_mels) float array."""
        mel = np.asarray(mel, np.float32)
        if mel.ndim == 2:
            mel = mel[None]
        if mel.shape[0] != 1 or mel.shape[1] != self.t_enc:
            raise ValueError(
                f"mel must be (1, {self.t_enc}, n_mels); got {mel.shape}")
        if not 1 <= max_new_tokens <= self.win:
            raise ValueError(
                f"max_new_tokens must be in [1, {self.win}]")
        rid = self._next_rid
        self._next_rid += 1
        eos = self.eos_id if eos_id is None else eos_id
        self._queue.append((rid, mel, max_new_tokens,
                            np.int64(-1 if eos is None else eos)))
        self._results[rid] = []
        self._done[rid] = False
        return rid

    @property
    def n_active(self) -> int:
        return sum(r >= 0 for r in self._slot_rid)

    @property
    def n_queued(self) -> int:
        return len(self._queue)

    @property
    def results(self) -> Dict[int, List[int]]:
        return self._results

    def is_done(self, rid: int) -> bool:
        return self._done[rid]

    def step(self, n_tokens: int = 1) -> Dict[int, List[int]]:
        """Admit whatever fits, then advance all live rows one token —
        or up to ``n_tokens`` tokens in ONE device dispatch (multi-step
        scheduling, token-identical for this greedy engine; a row hitting
        EOS mid-burst retires there and its later burst tokens are
        discarded)."""
        self.engine_steps += 1
        emitted: Dict[int, List[int]] = {}

        while self._queue:
            try:
                slot = self._slot_rid.index(-1)
            except ValueError:
                break
            rid, mel, max_new, eos = self._queue.popleft()
            self._ck, self._cv = self._admit_fn(
                self._enc_params, self.params, self._ck, self._cv,
                jnp.asarray(mel), np.int32(slot))
            self._slot_rid[slot] = rid
            self._slot_eos[slot] = eos
            self._budget[slot] = max_new
            self._lens[slot] = 0
            self._tokens = self._tokens.at[slot].set(self.bos_token)

        active = [s for s, r in enumerate(self._slot_rid) if r >= 0]
        if active:
            k = max(1, min(int(n_tokens),
                           int(min(self._budget[s] for s in active)),
                           int(min(self.win - self._lens[s]
                                   for s in active))))
            lens0 = self._lens.copy()
            if k > 1:
                self._tokens, self._ks, self._vs, toks_k = \
                    self._mstep_fn(self.params, self._ck, self._cv,
                                   self._ks, self._vs, self._tokens,
                                   jnp.asarray(self._lens), k)
                toks = jax.device_get(toks_k)  # (k, B)
            else:
                nxt, self._ks, self._vs = self._step_fn(
                    self.params, self._ck, self._cv, self._ks, self._vs,
                    self._tokens, jnp.asarray(self._lens))
                self._tokens = nxt
                toks = jax.device_get(nxt)[None]  # (1, B)
            active_set = set(active)
            for s in range(self.max_batch):
                self._lens[s] = lens0[s] + k if s in active_set else 0
            live = set(active)
            for j in range(k):
                for s in list(live):
                    rid = self._slot_rid[s]
                    tok = int(toks[j, s])
                    self.tokens_generated += 1
                    self._results[rid].append(tok)
                    emitted.setdefault(rid, []).append(tok)
                    self._budget[s] -= 1
                    if (tok == self._slot_eos[s] or self._budget[s] <= 0
                            or lens0[s] + j + 1 >= self.win):
                        self._slot_rid[s] = -1
                        self._done[rid] = True
                        live.discard(s)
        return emitted

    def run(self, n_tokens: int = 1) -> Dict[int, List[int]]:
        while self._queue or self.n_active:
            self.step(n_tokens=n_tokens)
        return {rid: list(t) for rid, t in self._results.items()}
