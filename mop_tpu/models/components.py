"""Core MoP components — ViT bricks and the MoP gate bricks, TPU-native.

Re-designed equivalents of reference ``mop/models/components.py`` (same public
names, ctor kwargs, and trainable-parameter counts; NHWC layouts and fused
einsum attention internally). Input images follow the reference convention
(B, 3, H, W); convs run channels-last on device.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import attention as ops_attn
from ..ops import fused as ops_fused
from ..config import use_fused_attention
from .layers import Conv, Embedding, LayerNorm, Linear, gelu_tanh, normal_init

Array = jax.Array


class DropPath(nn.Module):
    """Stochastic depth — drops the whole residual branch per sample.

    Matches reference ``components.py:14-27``.
    """

    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.drop_prob == 0.0 or not train:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class PatchEmbed(nn.Module):
    """Image to patch embedding via strided conv (reference ``components.py:30-40``).

    Takes (B, C, H, W) for API parity; runs NHWC internally.
    Returns (tokens (B, N, D), grid (Gh, Gw)).
    """

    in_ch: int = 3
    dim: int = 256
    patch: int = 4

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Tuple[int, int]]:
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        y = Conv(
            features=self.dim,
            kernel_size=(self.patch, self.patch),
            strides=(self.patch, self.patch),
            use_bias=False,
            name="proj",
        )(x)
        b, gh, gw, d = y.shape
        return y.reshape(b, gh * gw, d), (gh, gw)


class MSA(nn.Module):
    """Multi-head self-attention, fused QKV, bias-free (reference :43-66)."""

    dim: int
    heads: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        b, n, d = x.shape
        h = self.heads
        dk = d // h
        qkv = Linear(d * 3, use_bias=False, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, dk).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if use_fused_attention() and (self.attn_drop == 0.0 or not train):
            # Fused Pallas path: scores never materialize in HBM.
            y = ops_fused.flash_attention(q, k, v, causal=False)
        else:
            s = ops_attn.scaled_scores(q, k)
            a = jax.nn.softmax(s, axis=-1)
            a = nn.Dropout(self.attn_drop, deterministic=not train)(a)
            y = jnp.einsum("bhnm,bhmd->bhnd", a.astype(v.dtype), v)
        y = y.transpose(0, 2, 1, 3).reshape(b, n, d)
        y = Linear(d, use_bias=False, name="proj")(y)
        return nn.Dropout(self.proj_drop, deterministic=not train)(y)


class MLP(nn.Module):
    """Bias-free 2-layer MLP with tanh-GELU (reference :69-81)."""

    dim: int
    mlp_ratio: float = 4.0
    drop: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        hid = int(self.dim * self.mlp_ratio)
        x = Linear(hid, use_bias=False, name="fc1")(x)
        x = gelu_tanh(x)
        x = Linear(self.dim, use_bias=False, name="fc2")(x)
        return nn.Dropout(self.drop, deterministic=not train)(x)


class MoEMLP(nn.Module):
    """Token-level top-1 routed mixture-of-experts MLP (reference :84-121).

    Same parameter budget as E independent 2-layer MLPs plus a biased gate.
    Routing is a one-hot argmax; experts run as a single batched einsum over a
    stacked (E, D, H) weight tensor — MXU-friendly, no Python loop over experts.
    """

    dim: int
    mlp_ratio: float = 4.0
    num_experts: int = 4
    # 'dense' = reference-exact compute-all-experts; 'routed' = capacity-bounded
    # dispatch (O(T/E) per expert instead of O(T)); see mop_tpu.ops.moe.
    impl: str = "dense"
    capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        assert self.num_experts >= 2, "MoE requires at least 2 experts"
        hidden = int(self.dim * self.mlp_ratio)
        e = self.num_experts
        from ..ops import moe as ops_moe
        from .layers import torch_kaiming_uniform, fan_in_bias_init

        w1 = self.param("fc1", torch_kaiming_uniform(), (e, self.dim, hidden))
        w2 = self.param("fc2", torch_kaiming_uniform(), (e, hidden, self.dim))
        gate_w = self.param("gate_kernel", torch_kaiming_uniform(), (self.dim, e))
        gate_b = self.param("gate_bias", fan_in_bias_init(self.dim), (e,))

        b, n, d = x.shape
        xf = x.reshape(b * n, d)
        if self.impl == "routed":
            y = ops_moe.top1_routed_mlp(
                xf, gate_w, gate_b, w1, w2, gelu_tanh,
                capacity_factor=self.capacity_factor,
            )
        else:
            y = ops_moe.dense_top1_mlp(xf, gate_w, gate_b, w1, w2, gelu_tanh)
        return y.reshape(b, n, d)


class Block(nn.Module):
    """Pre-LN transformer block with stochastic depth (reference :124-141)."""

    dim: int
    heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        y = MSA(self.dim, self.heads, self.attn_drop, self.drop, name="attn")(
            LayerNorm(name="ln1")(x), train=train
        )
        x = x + DropPath(self.drop_path, name="dp1")(y, train=train)
        y = MLP(self.dim, self.mlp_ratio, self.drop, name="mlp")(
            LayerNorm(name="ln2")(x), train=train
        )
        x = x + DropPath(self.drop_path, name="dp2")(y, train=train)
        return x


class BlockMoE(nn.Module):
    """Transformer block with an MoE MLP (reference :144-168)."""

    dim: int
    heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    num_experts: int = 4
    moe_impl: str = "dense"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        y = MSA(self.dim, self.heads, self.attn_drop, self.drop, name="attn")(
            LayerNorm(name="ln1")(x), train=train
        )
        x = x + DropPath(self.drop_path, name="dp1")(y, train=train)
        y = MoEMLP(self.dim, self.mlp_ratio, self.num_experts,
                   impl=self.moe_impl, name="mlp")(
            LayerNorm(name="ln2")(x), train=train
        )
        x = x + DropPath(self.drop_path, name="dp2")(y, train=train)
        return x


class ViTEncoder(nn.Module):
    """Patchify + learned pos emb + transformer blocks + final LN (reference :171-205)."""

    dim: int = 256
    depth: int = 6
    heads: int = 4
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path: float = 0.1
    patch: int = 4
    num_tokens: int = 64

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Tuple[Array, Tuple[int, int]]:
        tok, grid = PatchEmbed(dim=self.dim, patch=self.patch, name="patch")(x)
        pos = self.param("pos", normal_init(0.02), (1, self.num_tokens, self.dim))
        tok = tok + pos
        dps = [float(v) for v in np.linspace(0.0, self.drop_path, self.depth)]
        for i in range(self.depth):
            tok = Block(
                self.dim,
                self.heads,
                self.mlp_ratio,
                self.drop,
                0.0,
                dps[i],
                name=f"blocks_{i}",
            )(tok, train=train)
        tok = LayerNorm(name="ln_f")(tok)
        return tok, grid


class ViTEncoderMoE(nn.Module):
    """ViT encoder with MoE MLP blocks (reference :208-252)."""

    dim: int = 256
    depth: int = 6
    heads: int = 4
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path: float = 0.1
    patch: int = 4
    num_tokens: int = 64
    num_experts: int = 4
    moe_impl: str = "dense"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Tuple[Array, Tuple[int, int]]:
        tok, grid = PatchEmbed(dim=self.dim, patch=self.patch, name="patch")(x)
        pos = self.param("pos", normal_init(0.02), (1, self.num_tokens, self.dim))
        tok = tok + pos
        dps = [float(v) for v in np.linspace(0.0, self.drop_path, self.depth)]
        for i in range(self.depth):
            tok = BlockMoE(
                self.dim,
                self.heads,
                self.mlp_ratio,
                self.drop,
                0.0,
                dps[i],
                num_experts=self.num_experts,
                moe_impl=self.moe_impl,
                name=f"blocks_{i}",
            )(tok, train=train)
        tok = LayerNorm(name="ln_f")(tok)
        return tok, grid


class ViewsLinear(nn.Module):
    """Token -> V spatial view maps (reference :255-267).

    Returns (B, V, Gh, Gw) to match the reference's channel-first gate-map API.
    """

    dim: int
    n_views: int = 5

    @nn.compact
    def __call__(self, tok: Array, grid: Tuple[int, int]) -> Array:
        b, n, d = tok.shape
        gh, gw = grid
        v = Linear(self.n_views, use_bias=False, name="proj")(tok)  # (B,N,V)
        return v.transpose(0, 2, 1).reshape(b, self.n_views, gh, gw)


class Kernels3(nn.Module):
    """3x3 conv -> SiLU -> 1x1 conv over view maps (reference :270-282).

    Input/output are channel-first (B, C, Gh, Gw) for API parity; compute is NHWC.
    """

    in_ch: int
    n_kernels: int = 3

    @nn.compact
    def __call__(self, maps: Array) -> Array:
        x = jnp.transpose(maps, (0, 2, 3, 1))
        x = Conv(16, (3, 3), padding=1, use_bias=False, name="conv1")(x)
        x = jax.nn.silu(x)
        x = Conv(self.n_kernels, (1, 1), use_bias=False, name="conv2")(x)
        return jnp.transpose(x, (0, 3, 1, 2))


class FuseExcInh(nn.Module):
    """Excitatory/inhibitory fusion (reference :285-303).

    Returns (G_pos, G_neg, a_pos, a_neg): sigmoid'd (B,1,Gh,Gw) maps and
    softplus'd scalar gains (alpha init 0.8).
    """

    in_ch: int

    @nn.compact
    def __call__(self, x: Array):
        hid = max(8, self.in_ch)
        y = jnp.transpose(x, (0, 2, 3, 1))
        y = Conv(hid, (1, 1), use_bias=False, name="fuse1")(y)
        y = jax.nn.silu(y)
        y = Conv(2, (1, 1), use_bias=True, name="fuse2")(y)
        g = jnp.transpose(y, (0, 3, 1, 2))  # (B,2,Gh,Gw)
        g_pos = jax.nn.sigmoid(g[:, :1])
        g_neg = jax.nn.sigmoid(g[:, 1:])
        alpha_pos = self.param("alpha_pos", lambda k, s: jnp.asarray(0.8), ())
        alpha_neg = self.param("alpha_neg", lambda k, s: jnp.asarray(0.8), ())
        a_pos = jax.nn.softplus(alpha_pos)
        a_neg = jax.nn.softplus(alpha_neg)
        return g_pos, g_neg, a_pos, a_neg
