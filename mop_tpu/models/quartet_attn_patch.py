"""Quartet attention: dual-path causal attention with learned score mixing.

Parity target: reference ``mop/models/quartet_attn_patch.py`` — a second QK
path, per-row score standardization (unbiased std), and a learned scalar mix
``(1-m)*qk_norm + m*(qk_norm*q2k2_norm)*scale`` with ``m = sigmoid(mixture)``
(gate init -5). TPU-native: causal mask built statically per trace, fp32
score accumulation, no registered buffers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import attention as A
from ..ops import fused as F
from ..config import use_fused_quartet
from .layers import Embedding, LayerNorm, Linear, gelu_tanh, normal_init

Array = jax.Array


@dataclass
class TransformerConfig:
    """Reference ``quartet_attn_patch.py:19-33``."""

    n_layer: int = 6
    n_head: int = 8
    n_embd: int = 512
    dropout: float = 0.1
    block_size: int = 512
    bias: bool = False
    # Quartet extras
    use_quartet: bool = True
    quartet_scale: float = 1.0
    quartet_gate_init: float = -5.0  # sigmoid(-5) ~ 0.0067
    score_norm_eps: float = 1e-5
    use_abs_pos_emb: bool = True
    # Causal-serving variant: standardize each score row over its CAUSAL
    # PREFIX (columns <= row) instead of the reference's all-columns
    # pre-mask statistics (quartet_attn_patch.py:95-98). Position i then
    # depends only on tokens <= i, so KV-cached decode is EXACT (see
    # ops.attention.standardize_scores_causal). Default False = reference
    # semantics.
    causal_std: bool = False


def _gpt_linear(features: int, use_bias: bool, name: str) -> Linear:
    """GPT-family linear: normal(0.02) init (reference :178-181)."""
    return Linear(features, use_bias=use_bias, kernel_init=normal_init(0.02), name=name)


class CausalSelfAttention(nn.Module):
    """Dual-path ('Quartet') causal self-attention (reference :35-127)."""

    config: TransformerConfig

    @nn.compact
    def __call__(
        self,
        x: Array,
        attention_mask: Optional[Array] = None,
        train: bool = False,
        need_weights: bool = False,
    ):
        cfg = self.config
        b, t, c = x.shape
        h = cfg.n_head
        dh = c // h

        def split(y):
            return y.reshape(b, t, h, dh).transpose(0, 2, 1, 3)

        q = split(_gpt_linear(c, cfg.bias, "q_proj")(x))
        k = split(_gpt_linear(c, cfg.bias, "k_proj")(x))
        v = split(_gpt_linear(c, cfg.bias, "v_proj")(x))
        qk = A.scaled_scores(q, k)

        if cfg.use_quartet:
            q2 = split(_gpt_linear(c, cfg.bias, "q2_proj")(x))
            k2 = split(_gpt_linear(c, cfg.bias, "k2_proj")(x))
            mixture = self.param(
                "mixture",
                lambda key, s: jnp.full(s, cfg.quartet_gate_init, jnp.float32),
                (1,),
            )
            qscale = self.param(
                "quartet_scale",
                lambda key, s: jnp.full(s, cfg.quartet_scale, jnp.float32),
                (1,),
            )
            m = jax.nn.sigmoid(mixture)
            std = (A.standardize_scores_causal if cfg.causal_std
                   else A.standardize_scores)
            if (use_fused_quartet() and attention_mask is None
                    and (not train or cfg.dropout == 0.0)
                    and not need_weights and not cfg.causal_std):
                # Fused kernel: standardize + dual-path product mix + causal
                # softmax + value matmul in one Pallas program. Grad-safe
                # (custom VJP recomputes via the reference composition), so
                # it also serves dropout-free training (pipeline stages).
                y = F.fused_quartet_attention(
                    q, k, v, q2, k2, m[0], qscale[0], eps=cfg.score_norm_eps)
                y = y.transpose(0, 2, 1, 3).reshape(b, t, c)
                y = _gpt_linear(c, cfg.bias, "o_proj")(y)
                return nn.Dropout(cfg.dropout, deterministic=not train)(y)
            q2k2 = A.scaled_scores(q2, k2)
            qk_norm = std(qk, cfg.score_norm_eps)
            q2k2_norm = std(q2k2, cfg.score_norm_eps)
            scores = (1.0 - m) * qk_norm + m * (qk_norm * q2k2_norm) * qscale
        else:
            std = (A.standardize_scores_causal if cfg.causal_std
                   else A.standardize_scores)
            scores = std(qk, 1e-5)

        causal = A.causal_mask(t)
        scores = A.apply_mask(scores, causal)
        if attention_mask is not None:
            scores = scores + attention_mask
        att = jax.nn.softmax(scores, axis=-1)
        att = nn.Dropout(cfg.dropout, deterministic=not train)(att)
        y = jnp.einsum("bhnm,bhmd->bhnd", att.astype(v.dtype), v)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, c)
        y = _gpt_linear(c, cfg.bias, "o_proj")(y)
        y = nn.Dropout(cfg.dropout, deterministic=not train)(y)
        if need_weights:
            return y, att
        return y


class MLP(nn.Module):
    """GPT MLP: fc -> tanh-GELU -> proj (reference :130-142)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.config
        x = _gpt_linear(4 * cfg.n_embd, cfg.bias, "fc")(x)
        x = gelu_tanh(x)
        x = _gpt_linear(cfg.n_embd, cfg.bias, "proj")(x)
        return nn.Dropout(cfg.dropout, deterministic=not train)(x)


class Block(nn.Module):
    """Pre-LN causal block (reference :145-158)."""

    config: TransformerConfig

    @nn.compact
    def __call__(
        self, x: Array, attention_mask: Optional[Array] = None, train: bool = False
    ) -> Array:
        x = x + CausalSelfAttention(self.config, name="attn")(
            LayerNorm(name="ln1")(x), attention_mask=attention_mask, train=train
        )
        x = x + MLP(self.config, name="mlp")(LayerNorm(name="ln2")(x), train=train)
        return x


class TinyTransformerLM(nn.Module):
    """Causal LM with tied head (reference :161-211)."""

    vocab_size: int
    config: TransformerConfig

    @nn.compact
    def __call__(
        self,
        idx: Array,
        attention_mask: Optional[Array] = None,
        targets: Optional[Array] = None,
        train: bool = False,
    ):
        cfg = self.config
        b, t = idx.shape
        assert t <= cfg.block_size, "Sequence length > block size"
        wte = Embedding(self.vocab_size, cfg.n_embd, name="wte")
        x = wte(idx)
        if cfg.use_abs_pos_emb:
            pos = jnp.arange(t)[None, :]
            x = x + Embedding(cfg.block_size, cfg.n_embd, name="wpe")(pos)
        x = nn.Dropout(cfg.dropout, deterministic=not train)(x)
        for i in range(cfg.n_layer):
            x = Block(cfg, name=f"blocks_{i}")(
                x, attention_mask=attention_mask, train=train
            )
        x = LayerNorm(name="ln_f")(x)
        logits = wte.attend(x)  # tied lm_head
        loss = None
        if targets is not None:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            loss = -jnp.mean(
                jnp.take_along_axis(logp, targets[..., None], axis=-1)
            )
        return logits, loss
