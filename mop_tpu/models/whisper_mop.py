"""Whisper-MoP: Mixture of Products for audio encoder-decoder transformers.

Parity target: reference ``mop/models/whisper_mop.py`` — encoder blocks apply
a per-timestep scalar gate computed from the *raw mel spectrogram* (recomputed
each layer with per-layer parameters); decoder is causal SA + cross-attention.
The 2D fuse uses raw (non-sigmoid) gate maps and a learnable alpha pair, and
the baseline factory is the same architecture with alpha zeroed so gate == 1.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import attention as A
from ..ops import fused as F
from ..config import use_fused_attention
from .layers import Conv, Embedding, LayerNorm, Linear, gelu_tanh, normal_init

Array = jax.Array


@dataclass
class WhisperConfig:
    """Reference ``whisper_mop.py:19-41``."""

    # Audio
    n_mels: int = 80
    n_audio_ctx: int = 1500
    # Text
    vocab_size: int = 51865
    n_text_ctx: int = 448
    # Transformer dims
    n_embd: int = 1024
    n_head: int = 16
    n_layer_enc: int = 12
    n_layer_dec: int = 12
    dropout: float = 0.0
    bias: bool = False
    use_abs_pos_emb: bool = True
    # MoP (encoder only)
    n_views: int = 5
    n_kernels: int = 3
    kernel_size: int = 5


def _wlin(features: int, use_bias: bool, name: str) -> Linear:
    """Whisper linear: normal(0.02) init (reference :336-341)."""
    return Linear(features, use_bias=use_bias, kernel_init=normal_init(0.02), name=name)


class ViewsConv2D(nn.Module):
    """1x1 conv: single-channel mel map -> V views (reference :47-56).

    Channel-first API (B,1,T,F) -> (B,V,T,F); NHWC compute.
    """

    n_views: int

    @nn.compact
    def __call__(self, mel2d: Array) -> Array:
        x = jnp.transpose(mel2d, (0, 2, 3, 1))
        y = Conv(self.n_views, (1, 1), use_bias=False, name="conv")(x)
        return jnp.transpose(y, (0, 3, 1, 2))


class Kernels2D(nn.Module):
    """kxk conv over (T,F): V views -> K pattern maps (reference :59-69)."""

    in_ch: int
    n_kernels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = self.kernel_size // 2
        y = jnp.transpose(x, (0, 2, 3, 1))
        y = Conv(
            self.n_kernels,
            (self.kernel_size, self.kernel_size),
            padding=pad,
            use_bias=False,
            name="conv",
        )(y)
        return jnp.transpose(y, (0, 3, 1, 2))


class FuseExcInh2D(nn.Module):
    """Excitatory/inhibitory fields from [views|kernels] (reference :72-88).

    NOTE: raw (non-sigmoid) maps and a learnable alpha pair init ones
    (zeros when ``zero_alpha`` — the baseline factory, reference :431-437).
    """

    in_ch: int
    zero_alpha: bool = False

    @nn.compact
    def __call__(self, x: Array):
        y = jnp.transpose(x, (0, 2, 3, 1))
        gates = Conv(2, (1, 1), use_bias=False, name="conv")(y)
        gates = jnp.transpose(gates, (0, 3, 1, 2))  # (B,2,T,F)
        g_pos, g_neg = gates[:, :1], gates[:, 1:]
        ainit = nn.initializers.zeros if self.zero_alpha else nn.initializers.ones
        alpha = self.param("alpha", ainit, (2,))
        return g_pos, g_neg, alpha[0], alpha[1]


class MoP2D(nn.Module):
    """Full MoP over mel spectrograms -> per-timestep scalar gate (reference :91-124)."""

    n_views: int
    n_kernels: int
    kernel_size: int
    zero_alpha: bool = False

    def setup(self):
        self.views = ViewsConv2D(self.n_views)
        self.kernels = Kernels2D(self.n_views, self.n_kernels, self.kernel_size)
        self.fuse = FuseExcInh2D(self.n_views + self.n_kernels, zero_alpha=self.zero_alpha)

    def __call__(self, mel2d: Array):
        v = self.views(mel2d)  # (B,V,T,F)
        k = self.kernels(v)  # (B,K,T,F)
        maps = jnp.concatenate([v, k], axis=1)
        g_pos, g_neg, a_pos, a_neg = self.fuse(maps)  # (B,1,T,F)
        g_pos_t = jnp.mean(g_pos, axis=3)  # (B,1,T)
        g_neg_t = jnp.mean(g_neg, axis=3)
        gate_t = 1.0 + a_pos * g_pos_t - a_neg * g_neg_t  # (B,1,T)
        return gate_t.transpose(0, 2, 1), v, k  # (B,T,1)


class MultiheadSelfAttention(nn.Module):
    """Optionally-causal SA (reference :137-177)."""

    dim: int
    n_head: int
    dropout: float
    bias: bool
    causal: bool

    @nn.compact
    def __call__(
        self, x: Array, attn_bias: Optional[Array] = None, train: bool = False
    ) -> Array:
        b, t, d = x.shape
        h, dh = self.n_head, d // self.n_head

        def split(y):
            return y.reshape(b, t, h, dh).transpose(0, 2, 1, 3)

        q = split(_wlin(d, self.bias, "q_proj")(x))
        k = split(_wlin(d, self.bias, "k_proj")(x))
        v = split(_wlin(d, self.bias, "v_proj")(x))
        if (use_fused_attention() and attn_bias is None
                and (self.dropout == 0.0 or not train)):
            y = F.flash_attention(q, k, v, causal=self.causal)
        else:
            att = A.scaled_scores(q, k)
            if self.causal:
                att = A.apply_mask(att, A.causal_mask(t))
            if attn_bias is not None:
                att = att + attn_bias
            att = jax.nn.softmax(att, axis=-1)
            att = nn.Dropout(self.dropout, deterministic=not train)(att)
            y = jnp.einsum("bhnm,bhmd->bhnd", att.astype(v.dtype), v)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, d)
        y = _wlin(d, self.bias, "o_proj")(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class MultiheadCrossAttention(nn.Module):
    """Decoder cross-attention to encoder memory (reference :180-221)."""

    dim_q: int
    dim_kv: int
    n_head: int
    dropout: float
    bias: bool

    @nn.compact
    def __call__(
        self,
        x_q: Array,
        x_kv: Array,
        attn_mask: Optional[Array] = None,
        train: bool = False,
    ) -> Array:
        b, tq, dq = x_q.shape
        tk = x_kv.shape[1]
        h, dh = self.n_head, dq // self.n_head
        q = _wlin(dq, self.bias, "q_proj")(x_q).reshape(b, tq, h, dh).transpose(0, 2, 1, 3)
        k = _wlin(dq, self.bias, "k_proj")(x_kv).reshape(b, tk, h, dh).transpose(0, 2, 1, 3)
        v = _wlin(dq, self.bias, "v_proj")(x_kv).reshape(b, tk, h, dh).transpose(0, 2, 1, 3)
        if (use_fused_attention() and attn_mask is None
                and (self.dropout == 0.0 or not train)):
            y = F.flash_attention(q, k, v, causal=False)
        else:
            att = A.scaled_scores(q, k)
            if attn_mask is not None:
                att = att + attn_mask
            att = jax.nn.softmax(att, axis=-1)
            att = nn.Dropout(self.dropout, deterministic=not train)(att)
            y = jnp.einsum("bhnm,bhmd->bhnd", att.astype(v.dtype), v)
        y = y.transpose(0, 2, 1, 3).reshape(b, tq, dq)
        y = _wlin(dq, self.bias, "o_proj")(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class WhisperMLP(nn.Module):
    """4x MLP with tanh-GELU (reference :224-235)."""

    dim: int
    dropout: float
    bias: bool

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = _wlin(4 * self.dim, self.bias, "fc")(x)
        x = gelu_tanh(x)
        x = _wlin(self.dim, self.bias, "proj")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class EncoderBlock(nn.Module):
    """Non-causal SA + MoP gate from mel2d + MLP (reference :241-264)."""

    cfg: WhisperConfig
    zero_alpha: bool = False

    def setup(self):
        c = self.cfg
        self.ln1 = LayerNorm()
        self.attn = MultiheadSelfAttention(c.n_embd, c.n_head, c.dropout, c.bias, causal=False)
        self.ln2 = LayerNorm()
        self.mlp = WhisperMLP(c.n_embd, c.dropout, c.bias)
        self.mop = MoP2D(c.n_views, c.n_kernels, c.kernel_size, zero_alpha=self.zero_alpha)

    def __call__(self, x: Array, mel2d: Array, train: bool = False):
        x = x + self.attn(self.ln1(x), train=train)
        gate_t, _, _ = self.mop(mel2d)  # (B,T,1)
        x = x * gate_t
        x = x + self.mlp(self.ln2(x), train=train)
        return x, gate_t.squeeze(-1)


class DecoderBlock(nn.Module):
    """Causal SA + cross-attn + MLP (reference :267-290)."""

    cfg: WhisperConfig

    def setup(self):
        c = self.cfg
        self.ln1 = LayerNorm()
        self.self_attn = MultiheadSelfAttention(c.n_embd, c.n_head, c.dropout, c.bias, causal=True)
        self.ln2 = LayerNorm()
        self.cross_attn = MultiheadCrossAttention(c.n_embd, c.n_embd, c.n_head, c.dropout, c.bias)
        self.ln3 = LayerNorm()
        self.mlp = WhisperMLP(c.n_embd, c.dropout, c.bias)

    def __call__(self, x: Array, enc: Array, train: bool = False) -> Array:
        x = x + self.self_attn(self.ln1(x), train=train)
        x = x + self.cross_attn(self.ln2(x), enc, train=train)
        x = x + self.mlp(self.ln3(x), train=train)
        return x


class WhisperMoP(nn.Module):
    """Encoder-decoder with MoP gating in the encoder (reference :296-421).

    ``baseline_mode=True`` zeroes the fuse alphas at init so gate == 1
    (the ``create_whisper_baseline`` factory, reference :431-437).
    """

    cfg: WhisperConfig
    baseline_mode: bool = False

    def setup(self):
        c = self.cfg
        self.audio_proj = _wlin(c.n_embd, c.bias, "audio_proj_lin")
        if c.use_abs_pos_emb:
            self.audio_pos = Embedding(c.n_audio_ctx, c.n_embd)
            self.text_pos = Embedding(c.n_text_ctx, c.n_embd)
        self.wte = Embedding(c.vocab_size, c.n_embd)
        self.drop = nn.Dropout(c.dropout)
        self.encoder = [
            EncoderBlock(c, zero_alpha=self.baseline_mode)
            for _ in range(c.n_layer_enc)
        ]
        self.decoder = [DecoderBlock(c) for _ in range(c.n_layer_dec)]
        self.enc_ln_f = LayerNorm()
        self.dec_ln_f = LayerNorm()

    def encode(self, mel: Array, train: bool = False):
        """mel (B, T_audio, n_mels) -> (enc_out (B,T,D), gates (B, L_enc, T))."""
        c = self.cfg
        b, t_a, f = mel.shape
        assert f == c.n_mels, "mel dim mismatch"
        x = self.audio_proj(mel)
        if c.use_abs_pos_emb:
            x = x + self.audio_pos(jnp.arange(t_a)[None, :])
        x = self.drop(x, deterministic=not train)
        mel2d = mel[:, None, :, :]  # (B,1,T,F)
        gate_layers = []
        for blk in self.encoder:
            x, gate_t = blk(x, mel2d, train=train)
            gate_layers.append(gate_t)
        x = self.enc_ln_f(x)
        return x, jnp.stack(gate_layers, axis=1)

    def decode(self, enc_out: Array, dec_input_ids: Array, train: bool = False) -> Array:
        c = self.cfg
        b, t_t = dec_input_ids.shape
        x = self.wte(dec_input_ids)
        if c.use_abs_pos_emb:
            x = x + self.text_pos(jnp.arange(t_t)[None, :])
        x = self.drop(x, deterministic=not train)
        for blk in self.decoder:
            x = blk(x, enc_out, train=train)
        x = self.dec_ln_f(x)
        return self.wte.attend(x)  # tied lm_head

    def __call__(
        self,
        mel: Array,
        dec_input_ids: Array,
        targets: Optional[Array] = None,
        train: bool = False,
    ):
        enc_out, gates = self.encode(mel, train=train)
        logits = self.decode(enc_out, dec_input_ids, train=train)
        loss = None
        if targets is not None:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            loss = -jnp.mean(jnp.take_along_axis(logp, targets[..., None], axis=-1))
        return logits, loss, gates

    def get_gate_maps(self, mel: Array):
        """Encoder-only pass returning per-layer time gates (reference :416-421)."""
        _, gates = self.encode(mel, train=False)
        return gates


def create_whisper_mop(cfg: WhisperConfig) -> WhisperMoP:
    return WhisperMoP(cfg)


def create_whisper_baseline(cfg: WhisperConfig) -> WhisperMoP:
    """Same architecture with MoP alphas zeroed so gate == 1 (reference :431-437).

    In JAX params are explicit: use ``zero_mop_alphas`` on the initialized
    params to realize the baseline, or init via ``init_baseline_params``.
    """
    return WhisperMoP(cfg, baseline_mode=True)


def zero_mop_alphas(params):
    """Zero every encoder ``mop.fuse.alpha`` leaf (gate -> identity)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    for k in list(flat.keys()):
        if "fuse" in k and k[-1] == "alpha":
            flat[k] = jnp.zeros_like(flat[k])
    return flax.traverse_util.unflatten_dict(flat)
