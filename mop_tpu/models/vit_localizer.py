"""ViT single-box localizer + IoU (reference ``experiments/voc_localization_vit.py``).

Modes: A (plain ViT encoder), B (MoP token gate after the encoder),
E (UnifiedMSA edgewise blocks). Head: LN -> MLP -> sigmoid 4-vector in [0,1]
(reference ``ViTLocHead`` :108-118). ``bbox_iou`` reproduces the reference's
corner-normalizing, clamped IoU (:244-266).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .attention_variants import UnifiedMSA
from .components import FuseExcInh, Kernels3, PatchEmbed, ViewsLinear, ViTEncoder
from .layers import LayerNorm, Linear, gelu_tanh, normal_init

Array = jax.Array


class ViTLocHead(nn.Module):
    """LN -> Linear -> tanh-GELU -> Linear(4, bias) -> sigmoid."""

    dim: int

    @nn.compact
    def __call__(self, tok: Array) -> Array:
        pooled = jnp.mean(tok, axis=1)
        x = LayerNorm(name="ln")(pooled)
        x = Linear(self.dim, use_bias=False, name="fc1")(x)
        x = gelu_tanh(x)
        x = Linear(4, use_bias=True, name="fc2")(x)
        return jax.nn.sigmoid(x)


class _BlockUnified(nn.Module):
    """Pre-LN block hosting a UnifiedMSA (reference ``_BlockUnified``)."""

    dim: int
    heads: int
    attn_mode: str
    attn_kwargs: Optional[Dict]
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(self.attn_kwargs or {})
        x = x + UnifiedMSA(self.attn_mode, dim=self.dim, heads=self.heads,
                           **kw, name="attn")(LayerNorm(name="ln1")(x), train=train)
        hidden = int(self.dim * self.mlp_ratio)
        y = LayerNorm(name="ln2")(x)
        y = Linear(hidden, use_bias=False, name="mlp_fc1")(y)
        y = gelu_tanh(y)
        y = Linear(self.dim, use_bias=False, name="mlp_fc2")(y)
        return x + y


class ViTLocalizer(nn.Module):
    """Single-object bbox regressor (reference :121-238)."""

    dim: int = 256
    depth: int = 6
    heads: int = 4
    mlp_ratio: float = 4.0
    drop_path: float = 0.1
    patch: int = 16
    img_size: int = 224
    attn_mode: str = "A"
    attn_kwargs: Optional[Dict] = None
    mop_views: int = 5
    mop_kernels: int = 3

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        mode = str(self.attn_mode).upper()
        num_tokens = (self.img_size // self.patch) ** 2
        if mode in ("A", "B"):
            tok, grid = ViTEncoder(
                dim=self.dim, depth=self.depth, heads=self.heads,
                mlp_ratio=self.mlp_ratio, drop_path=self.drop_path,
                patch=self.patch, num_tokens=num_tokens, name="enc",
            )(x, train=train)
            if mode == "B":
                v = ViewsLinear(self.dim, n_views=self.mop_views, name="views")(tok, grid)
                k = Kernels3(in_ch=self.mop_views, n_kernels=self.mop_kernels,
                             name="kerns")(v)
                maps = jnp.concatenate([v, k], axis=1)
                g_pos, g_neg, a_pos, a_neg = FuseExcInh(
                    in_ch=self.mop_views + self.mop_kernels, name="fuse")(maps)
                gate = 1.0 + a_pos * g_pos - a_neg * g_neg
                b, n, d = tok.shape
                tok = tok * gate.reshape(b, n, 1)
        elif mode == "E":
            tok, grid = PatchEmbed(dim=self.dim, patch=self.patch,
                                   name="patch_embed")(x)
            pos = self.param("pos", normal_init(0.02), (1, num_tokens, self.dim))
            tok = tok + pos
            for i in range(self.depth):
                tok = _BlockUnified(
                    self.dim, self.heads, "E", self.attn_kwargs,
                    self.mlp_ratio, name=f"blocks_{i}",
                )(tok, train=train)
            tok = LayerNorm(name="ln_f")(tok)
        else:
            raise ValueError(f"Unknown attn_mode: {self.attn_mode}")
        return ViTLocHead(self.dim, name="head")(tok)


def bbox_iou(box1: Array, box2: Array) -> Array:
    """IoU over normalized [x0,y0,x1,y1] boxes with corner normalization and
    [0,1] clamping (reference :244-266)."""
    def corners(b):
        x0 = jnp.clip(jnp.minimum(b[..., 0], b[..., 2]), 0.0, 1.0)
        y0 = jnp.clip(jnp.minimum(b[..., 1], b[..., 3]), 0.0, 1.0)
        x1 = jnp.clip(jnp.maximum(b[..., 0], b[..., 2]), 0.0, 1.0)
        y1 = jnp.clip(jnp.maximum(b[..., 1], b[..., 3]), 0.0, 1.0)
        return x0, y0, x1, y1

    x0_1, y0_1, x1_1, y1_1 = corners(box1)
    x0_2, y0_2, x1_2, y1_2 = corners(box2)
    xa = jnp.maximum(x0_1, x0_2)
    ya = jnp.maximum(y0_1, y0_2)
    xb = jnp.minimum(x1_1, x1_2)
    yb = jnp.minimum(y1_1, y1_2)
    inter = jnp.clip(xb - xa, 0.0) * jnp.clip(yb - ya, 0.0)
    area1 = jnp.clip(x1_1 - x0_1, 0.0) * jnp.clip(y1_1 - y0_1, 0.0)
    area2 = jnp.clip(x1_2 - x0_2, 0.0) * jnp.clip(y1_2 - y0_2, 0.0)
    union = jnp.clip(area1 + area2 - inter, 1e-12)
    return inter / union


def smooth_l1(pred: Array, target: Array, beta: float = 1.0) -> Array:
    """SmoothL1 / Huber (reference training loss :382)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
