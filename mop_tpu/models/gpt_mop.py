"""GPT-MoP: Mixture of Products for causal language modeling.

Parity target: reference ``mop/models/gpt_mop.py`` — 1D MoP gating applied
between attention and MLP in each causal block. Note the reference's 1D fuse
deliberately differs from the ViT version: no sigmoid on the gate maps and a
raw learnable alpha pair (``gpt_mop.py:50-68``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv1d, Embedding, LayerNorm, Linear, normal_init
from .quartet_attn_patch import MLP, CausalSelfAttention, TransformerConfig

Array = jax.Array


class ViewsLinear1D(nn.Module):
    """Multi-view projection for token sequences (reference :19-32).

    (B, T, D) -> (B, V, T).
    """

    dim: int
    n_views: int = 5

    @nn.compact
    def __call__(self, tok: Array) -> Array:
        views = Linear(
            self.n_views, use_bias=False, kernel_init=normal_init(0.02), name="proj"
        )(tok)
        return views.transpose(0, 2, 1)


class Kernels1D(nn.Module):
    """1D conv kernels for sequential pattern detection (reference :35-47).

    (B, V, T) -> (B, K, T); same-padding, bias-free.

    ``causal=True`` switches to LEFT padding (position t sees taps
    t-ks+1..t instead of the reference's centered t-1,t,t+1) — the
    serving-exact variant: the gate at position t then depends only on
    tokens <= t, so KV-cached decode of GPT_MoP is exact rather than a
    frontier approximation (see models.generate MoP decode).
    """

    in_ch: int
    n_kernels: int = 3
    kernel_size: int = 3
    causal: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = x.transpose(0, 2, 1)  # (B, T, V) channels-last
        pad = ((self.kernel_size - 1, 0) if self.causal
               else self.kernel_size // 2)
        y = Conv1d(
            self.n_kernels,
            self.kernel_size,
            padding=pad,
            use_bias=False,
            name="conv",
        )(y)
        return y.transpose(0, 2, 1)


class FuseExcInh1D(nn.Module):
    """Excitatory/inhibitory gating for sequences (reference :50-68).

    NOTE: unlike the 2D ViT fuse, there is NO sigmoid on the gate maps and the
    alpha pair is a raw learnable vector init ones.
    """

    in_ch: int

    @nn.compact
    def __call__(self, x: Array):
        y = x.transpose(0, 2, 1)  # (B, T, V+K)
        gates = Conv1d(2, 1, use_bias=False, name="conv")(y)  # (B, T, 2)
        gates = gates.transpose(0, 2, 1)  # (B, 2, T)
        g_pos, g_neg = gates[:, :1], gates[:, 1:]
        alpha = self.param("alpha", nn.initializers.ones, (2,))
        return g_pos, g_neg, alpha[0], alpha[1]


class MoPBlock(nn.Module):
    """Causal block with MoP between attention and MLP (reference :71-136)."""

    config: TransformerConfig
    n_views: int = 5
    n_kernels: int = 3
    causal_gate: bool = False

    def setup(self):
        cfg = self.config
        self.ln1 = LayerNorm()
        self.attn = CausalSelfAttention(cfg)
        self.ln2 = LayerNorm()
        self.mlp = MLP(cfg)
        self.views = ViewsLinear1D(cfg.n_embd, n_views=self.n_views)
        self.kernels = Kernels1D(in_ch=self.n_views, n_kernels=self.n_kernels,
                                 causal=self.causal_gate)
        self.fuse = FuseExcInh1D(in_ch=self.n_views + self.n_kernels)

    def _mop_gate(self, x: Array):
        v = self.views(x)  # (B, V, T)
        k = self.kernels(v)  # (B, K, T)
        maps = jnp.concatenate([v, k], axis=1)
        g_pos, g_neg, a_pos, a_neg = self.fuse(maps)
        gate = 1.0 + a_pos * g_pos - a_neg * g_neg  # (B, 1, T)
        return gate, v, k

    def apply_mop(self, x: Array) -> Array:
        gate, _, _ = self._mop_gate(x)
        return x * gate.transpose(0, 2, 1)  # (B, T, 1) broadcast over D

    def get_gate_maps(self, x: Array):
        return self._mop_gate(x)

    def __call__(
        self, x: Array, attention_mask: Optional[Array] = None, train: bool = False
    ) -> Array:
        x = x + self.attn(self.ln1(x), attention_mask=attention_mask, train=train)
        x = self.apply_mop(x)
        x = x + self.mlp(self.ln2(x), train=train)
        return x


class GPT_MoP(nn.Module):
    """GPT-style LM with MoP gating (reference :139-245)."""

    vocab_size: int
    config: TransformerConfig
    n_views: int = 5
    n_kernels: int = 3
    # causal_gate=True: the gate convs left-pad (see Kernels1D) and — paired
    # with config.causal_std=True — position t of the forward depends only
    # on tokens <= t, making KV-cached decode/serving EXACT. False keeps
    # the reference's centered (non-causal) convs (gpt_mop.py:35-47).
    causal_gate: bool = False

    def setup(self):
        cfg = self.config
        self.wte = Embedding(self.vocab_size, cfg.n_embd)
        if cfg.use_abs_pos_emb:
            self.wpe = Embedding(cfg.block_size, cfg.n_embd)
        self.drop = nn.Dropout(cfg.dropout)
        self.blocks = [
            MoPBlock(cfg, n_views=self.n_views, n_kernels=self.n_kernels,
                     causal_gate=self.causal_gate)
            for _ in range(cfg.n_layer)
        ]
        self.ln_f = LayerNorm()

    def _embed(self, idx: Array, train: bool) -> Array:
        cfg = self.config
        b, t = idx.shape
        assert t <= cfg.block_size, "Sequence length > block size"
        x = self.wte(idx)
        if cfg.use_abs_pos_emb:
            x = x + self.wpe(jnp.arange(t)[None, :])
        return self.drop(x, deterministic=not train)

    def __call__(
        self,
        idx: Array,
        attention_mask: Optional[Array] = None,
        targets: Optional[Array] = None,
        train: bool = False,
    ):
        x = self._embed(idx, train)
        for block in self.blocks:
            x = block(x, attention_mask=attention_mask, train=train)
        x = self.ln_f(x)
        logits = self.wte.attend(x)  # tied head
        loss = None
        if targets is not None:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            loss = -jnp.mean(jnp.take_along_axis(logp, targets[..., None], axis=-1))
        return logits, loss

    def get_gate_maps(self, idx: Array):
        """Per-layer gate/view/kernel maps (reference :209-245).

        Returns gates (B, L, 1, T), views (B, L, V, T), kernels (B, L, K, T).
        """
        x = self._embed(idx, train=False)
        all_gates, all_views, all_kernels = [], [], []
        for block in self.blocks:
            x_res = x + block.attn(block.ln1(x), train=False)
            gate, views, kernels = block.get_gate_maps(x_res)
            all_gates.append(gate)
            all_views.append(views)
            all_kernels.append(kernels)
            x = block.apply_mop(x_res)
            x = x + block.mlp(block.ln2(x), train=False)
        return (
            jnp.stack(all_gates, axis=1),
            jnp.stack(all_views, axis=1),
            jnp.stack(all_kernels, axis=1),
        )


def create_gpt_mop(vocab_size: int, config: TransformerConfig, n_views=5, n_kernels=3):
    """Reference ``gpt_mop.py:249-253``."""
    return GPT_MoP(
        vocab_size=vocab_size, config=config, n_views=n_views, n_kernels=n_kernels
    )


def create_gpt_mop_causal(vocab_size: int, config: TransformerConfig,
                          n_views=5, n_kernels=3):
    """The serving-exact GPT_MoP variant: causal gate convs (left-padded
    ``Kernels1D``) + causal-prefix score standardization
    (``config.causal_std=True``). Position t depends only on tokens <= t,
    so KV-cached decode reproduces the full-window sampler token-for-token
    (pinned in tests/test_gpt_mop_serving.py). Same parameter count and
    structure as the reference-exact :func:`create_gpt_mop`."""
    import dataclasses

    cfg = dataclasses.replace(config, causal_std=True)
    return GPT_MoP(vocab_size=vocab_size, config=cfg, n_views=n_views,
                   n_kernels=n_kernels, causal_gate=True)


def create_gpt_baseline(vocab_size: int, config: TransformerConfig):
    """Plain GPT — no Quartet, no MoP (reference :256-267)."""
    from .quartet_attn_patch import TinyTransformerLM

    base_config = TransformerConfig(
        n_layer=config.n_layer,
        n_head=config.n_head,
        n_embd=config.n_embd,
        dropout=config.dropout,
        block_size=config.block_size,
        bias=config.bias,
        use_quartet=False,
    )
    return TinyTransformerLM(vocab_size=vocab_size, config=base_config)


def create_gpt_quartet(vocab_size: int, config: TransformerConfig):
    """Quartet attention, no MoP (reference :270-281)."""
    from .quartet_attn_patch import TinyTransformerLM

    quartet_config = TransformerConfig(
        n_layer=config.n_layer,
        n_head=config.n_head,
        n_embd=config.n_embd,
        dropout=config.dropout,
        block_size=config.block_size,
        bias=config.bias,
        use_quartet=True,
    )
    return TinyTransformerLM(vocab_size=vocab_size, config=quartet_config)
