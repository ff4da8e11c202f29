"""ViT-MoP: Vision Transformer with Mixture of Products gating.

Parity target: reference ``mop/models/vit_mop.py`` — encoder -> multi-view
projection -> learnable kernels -> excitatory/inhibitory fusion -> spatial gate
``1 + a_pos*G_pos - a_neg*G_neg`` applied multiplicatively to tokens -> pool ->
head, plus the ``get_gate_maps`` introspection API and the optional MoE encoder.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .components import FuseExcInh, Kernels3, ViewsLinear, ViTEncoder, ViTEncoderMoE
from .layers import Linear

Array = jax.Array


class ViT_MoP(nn.Module):
    """ViT with spatial boolean logic via excitatory/inhibitory gating
    (reference ``vit_mop.py:15-140``)."""

    dim: int = 256
    depth: int = 6
    heads: int = 4
    mlp_ratio: float = 4.0
    n_classes: int = 10
    n_views: int = 5
    n_kernels: int = 3
    drop_path: float = 0.1
    patch: int = 4
    img_size: int = 32
    use_moe: bool = False
    moe_experts: int = 4
    moe_impl: str = "dense"  # 'dense' (reference-exact) | 'routed' (capacity)

    def setup(self):
        assert self.dim % self.heads == 0, (
            f"dim {self.dim} not divisible by heads {self.heads}"
        )
        num_tokens = (self.img_size // self.patch) ** 2
        if self.use_moe:
            self.enc = ViTEncoderMoE(
                dim=self.dim,
                depth=self.depth,
                heads=self.heads,
                mlp_ratio=self.mlp_ratio,
                drop_path=self.drop_path,
                patch=self.patch,
                num_tokens=num_tokens,
                num_experts=int(self.moe_experts),
                moe_impl=self.moe_impl,
            )
        else:
            self.enc = ViTEncoder(
                dim=self.dim,
                depth=self.depth,
                heads=self.heads,
                mlp_ratio=self.mlp_ratio,
                drop_path=self.drop_path,
                patch=self.patch,
                num_tokens=num_tokens,
            )
        self.views = ViewsLinear(self.dim, n_views=self.n_views)
        self.kerns = Kernels3(in_ch=self.n_views, n_kernels=self.n_kernels)
        self.fuse = FuseExcInh(in_ch=self.n_views + self.n_kernels)
        self.cls = Linear(self.n_classes, use_bias=False)

    def _gate(self, tok: Array, grid: Tuple[int, int]):
        v = self.views(tok, grid)  # (B,V,Gh,Gw)
        k = self.kerns(v)  # (B,K,Gh,Gw)
        maps = jnp.concatenate([v, k], axis=1)
        g_pos, g_neg, a_pos, a_neg = self.fuse(maps)
        gate = 1.0 + a_pos * g_pos - a_neg * g_neg  # (B,1,Gh,Gw)
        return gate, v, k

    def __call__(self, x: Array, train: bool = False) -> Array:
        tok, grid = self.enc(x, train=train)
        b, n, d = tok.shape
        gate, _, _ = self._gate(tok, grid)
        tok = tok * gate.reshape(b, n, 1)
        pooled = jnp.mean(tok, axis=1)
        return self.cls(pooled)

    def get_gate_maps(self, x: Array):
        """Return (gate (B,1,Gh,Gw), views (B,V,Gh,Gw), kernels (B,K,Gh,Gw))
        — the visualization API of reference ``vit_mop.py:120-140``."""
        tok, grid = self.enc(x, train=False)
        return self._gate(tok, grid)
