"""Text embeddings from the causal-LM families (OpenAI /v1/embeddings).

The reference has no inference surface at all (SURVEY §0 — its GPT stops
at teacher-forced logits, `/root/reference/mop/models/gpt_mop.py:181-207`);
this is part of the TPU-native serving layer around the same models.

Mechanism: one padded forward pass over the TinyTransformerLM families
(baseline + quartet — the models the decode engines serve), the final
LayerNorm output masked-mean-pooled over real positions and L2-normalized
(the OpenAI convention: unit-norm vectors, cosine == dot).

Right-padding must be EXACT, and causality alone does not make it so: the
quartet/baseline attention standardizes each score row over ALL key
columns before masking (reference quartet_attn_patch.py:95-116 semantics),
so a pad column would leak into every real row's mean/σ. The forward here
therefore recomputes the stack with per-row length masking — row
statistics and softmax over each sequence's first ``len`` columns only —
the same live-column treatment as :func:`mop_tpu.models.generate.
prefill_padded`, generalized from one scalar ``t0`` to a per-row length
vector (test_embeddings.py pins solo == co-batched bit-for-near-bit).
Shapes are bucketed to powers of two in batch and length so the jit cache
stays small (one compile per (B, T) bucket).
"""

from __future__ import annotations

import base64
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.generate import _lin, _ln, _mop_gate_full
from ..models.layers import gelu_tanh


def _pow2_at_least(n: int, lo: int) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


class EmbeddingModel:
    """Pooled-hidden-state embedder over a GPT-family model.

    >>> emb = EmbeddingModel(model, params)
    >>> vecs = emb.embed([[5, 17, 3], [9, 8, 7, 6]])   # (2, n_embd)

    ``pool``: ``"mean"`` (masked mean over positions, default) or
    ``"last"`` (the final real token's hidden state — the causal-LM
    sentence summary). ``normalize``: L2-normalize outputs (default, the
    OpenAI convention)."""

    def __init__(self, model, params, pool: str = "mean",
                 normalize: bool = True, max_chunk: int = 32):
        if pool not in ("mean", "last"):
            raise ValueError(f"pool must be 'mean' or 'last', got {pool!r}")
        self.model = model
        # accept either the full variables dict (what the engines hold)
        # or a bare params tree
        self.params = params["params"] if "params" in params else params
        self.pool = pool
        self.normalize = normalize
        self.block_size = model.config.block_size
        self.n_embd = model.config.n_embd
        self.vocab_size = model.vocab_size
        # Large requests are chunked through buckets of at most this many
        # rows, bounding both the per-forward device footprint and the set
        # of jit-compiled (B, T) shapes (B buckets: 1,2,4..max_chunk).
        self.max_chunk = max(1, int(max_chunk))
        self._fns = {}

    def _fn(self, b: int, t: int):
        if (b, t) in self._fns:
            return self._fns[(b, t)]
        cfg, pool, norm = self.model.config, self.pool, self.normalize
        mop_causal = bool(getattr(self.model, "causal_gate", False))

        def run(p, idx, lens):
            # Length-masked forward (prefill_padded semantics, per-row
            # lens): row statistics + softmax over each row's live
            # columns only, so pads cannot perturb real positions.
            bb, tt = idx.shape
            x = p["wte"]["embedding"][idx]
            if cfg.use_abs_pos_emb:
                x = x + p["wpe"]["embedding"][jnp.arange(tt)][None]
            h_ = cfg.n_head
            dk = cfg.n_embd // h_
            split = lambda y: y.reshape(bb, tt, h_, dk).transpose(
                0, 2, 1, 3)
            scale = 1.0 / jnp.sqrt(dk).astype(jnp.float32)
            live = jnp.arange(tt)[None, :] < lens[:, None]       # (B, T)
            causal = (jnp.tril(jnp.ones((tt, tt), bool))[None]
                      & live[:, None, :])                     # (B, T, T)
            nf = jnp.maximum(lens, 1).astype(
                jnp.float32)[:, None, None, None]

            if getattr(cfg, "causal_std", False):
                from ..ops.attention import standardize_scores_causal

                def std(s, e):
                    # causal variant: row i's prefix is entirely live
                    return standardize_scores_causal(s, e)
            else:
                def std(s, e):
                    m = live[:, None, None, :]
                    mu = jnp.sum(jnp.where(m, s, 0.0), -1,
                                 keepdims=True) / nf
                    var = jnp.sum(jnp.where(m, jnp.square(s - mu), 0.0),
                                  -1, keepdims=True) / jnp.maximum(
                        nf - 1.0, 1.0)
                    return (s - mu) / (jnp.sqrt(var) + e)

            for i in range(cfg.n_layer):
                bp = p[f"blocks_{i}"]
                hx = _ln(x, bp["ln1"])
                ap = bp["attn"]
                q, k, v = (split(_lin(hx, ap[n]))
                           for n in ("q_proj", "k_proj", "v_proj"))
                qk = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
                if cfg.use_quartet:
                    q2 = split(_lin(hx, ap["q2_proj"]))
                    k2 = split(_lin(hx, ap["k2_proj"]))
                    q2k2 = jnp.einsum("bhqd,bhkd->bhqk", q2, k2) * scale
                    mix = jax.nn.sigmoid(ap["mixture"][0])
                    scores = ((1.0 - mix) * std(qk, cfg.score_norm_eps)
                              + mix * (std(qk, cfg.score_norm_eps)
                                       * std(q2k2, cfg.score_norm_eps))
                              * ap["quartet_scale"][0])
                else:
                    scores = std(qk, 1e-5)  # non-quartet hardcodes 1e-5
                scores = jnp.where(causal[:, None], scores, -jnp.inf)
                att = jax.nn.softmax(scores, axis=-1)
                att = jnp.where(jnp.isnan(att), 0.0, att)  # pad rows
                y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
                y = y.transpose(0, 2, 1, 3).reshape(bb, tt, cfg.n_embd)
                x = x + _lin(y, ap["o_proj"])
                if "views" in bp:  # GPT_MoP: gate between attn and MLP,
                    # per-row length-masked view rows (pads never tap in)
                    gate, _ = _mop_gate_full(bp, x, t_live=lens,
                                             causal=mop_causal)
                    x = x * gate[..., None]
                hm = _ln(x, bp["ln2"])
                x = x + _lin(gelu_tanh(_lin(hm, bp["mlp"]["fc"])),
                             bp["mlp"]["proj"])
            h = _ln(x, p["ln_f"])                            # (B, T, D)
            mask = live.astype(h.dtype)
            if pool == "mean":
                emb = (h * mask[..., None]).sum(1) \
                    / jnp.maximum(mask.sum(1), 1.0)[:, None]
            else:
                emb = jnp.take_along_axis(
                    h, jnp.maximum(lens - 1, 0)[:, None, None]
                    .astype(jnp.int32), 1)[:, 0]
            if norm:
                emb = emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            return emb.astype(jnp.float32)

        self._fns[(b, t)] = jax.jit(run)
        return self._fns[(b, t)]

    def embed(self, token_lists: Sequence[Sequence[int]]) -> np.ndarray:
        """Embed a batch of token-id sequences; returns (N, n_embd)
        float32. Each sequence must have 1 <= len <= block_size and ids in
        [0, vocab_size). Batches larger than ``max_chunk`` are processed in
        fixed-size chunks (one bounded forward each) rather than a single
        unbounded power-of-two pad."""
        if not token_lists:
            return np.zeros((0, self.n_embd), np.float32)
        lens = [len(s) for s in token_lists]
        if min(lens) < 1:
            raise ValueError("empty input sequence")
        if max(lens) > self.block_size:
            raise ValueError(
                f"input length {max(lens)} exceeds the model context "
                f"window ({self.block_size})")
        for seq in token_lists:
            for t in seq:
                # bool is an int subclass; JAX's gather would silently
                # clamp out-of-range ids to a plausible-looking embedding
                if isinstance(t, bool) or not 0 <= int(t) < self.vocab_size:
                    raise ValueError(
                        f"token id {t!r} outside [0, {self.vocab_size})")
        parts = []
        for lo in range(0, len(token_lists), self.max_chunk):
            chunk = token_lists[lo:lo + self.max_chunk]
            clens = lens[lo:lo + self.max_chunk]
            bt = _pow2_at_least(len(chunk), 1)
            tt = min(_pow2_at_least(max(clens), 8), self.block_size)
            idx = np.zeros((bt, tt), np.int32)
            for i, seq in enumerate(chunk):
                idx[i, :len(seq)] = np.asarray(seq, np.int32)
            ln = np.zeros((bt,), np.int32)
            ln[:len(clens)] = clens
            out = self._fn(bt, tt)(self.params, jnp.asarray(idx),
                                   jnp.asarray(ln))
            parts.append(np.asarray(out)[:len(chunk)])
        return np.concatenate(parts, axis=0)


def parse_embedding_input(req: dict, tokenizer) -> List[List[int]]:
    """OpenAI ``input`` shapes: a string, a list of strings, a token-id
    list, or a list of token-id lists. Returns a list of id sequences."""
    inp = req.get("input")
    if inp is None:
        raise ValueError("'input' is required")
    is_id = lambda x: isinstance(x, int) and not isinstance(x, bool)
    if isinstance(inp, str):
        items = [inp]
    elif isinstance(inp, list) and inp and all(is_id(x) for x in inp):
        return [[int(t) for t in inp]]
    elif isinstance(inp, list):
        items = inp
    else:
        raise ValueError("input must be a string or a list")
    if not items:
        raise ValueError("input must be non-empty")
    out = []
    for it in items:
        if isinstance(it, str):
            if tokenizer is None:
                raise ValueError(
                    "string input needs a server with tokenizer=")
            ids = tokenizer.encode(it)
            if not ids:
                raise ValueError("an input encoded to zero tokens")
            out.append([int(t) for t in ids])
        elif isinstance(it, list) and it and all(is_id(x) for x in it):
            out.append([int(t) for t in it])
        else:
            raise ValueError(
                "input list items must be strings or token-id lists")
    return out


def embeddings_body(vecs: np.ndarray, model_name: str, n_tokens: int,
                    encoding_format: str = "float",
                    dimensions: Optional[int] = None) -> dict:
    """The OpenAI embeddings response. ``dimensions`` truncates then
    re-normalizes (the matryoshka convention); ``base64`` packs each
    vector's float32 little-endian bytes."""
    if encoding_format not in ("float", "base64"):
        raise ValueError(
            f"encoding_format must be 'float' or 'base64', got "
            f"{encoding_format!r}")
    if dimensions is not None:
        if not 1 <= dimensions <= vecs.shape[-1]:
            raise ValueError(
                f"dimensions must be in [1, {vecs.shape[-1]}], got "
                f"{dimensions}")
        vecs = vecs[:, :dimensions]
        nrm = np.maximum(np.linalg.norm(vecs, axis=-1, keepdims=True),
                         1e-12)
        vecs = vecs / nrm
    data = []
    for i, v in enumerate(np.asarray(vecs, np.float32)):
        if encoding_format == "base64":
            e = base64.b64encode(v.astype("<f4").tobytes()).decode()
        else:
            e = [float(x) for x in v]
        data.append({"object": "embedding", "index": i, "embedding": e})
    return {"object": "list", "data": data, "model": model_name,
            "usage": {"prompt_tokens": n_tokens, "total_tokens": n_tokens}}
