"""Baseline Vision Transformer (reference ``mop/models/vit_baseline.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .components import ViTEncoder
from .layers import Linear

Array = jax.Array


class ViT_Baseline(nn.Module):
    """Standard ViT: encoder -> mean-pool -> bias-free linear head.

    Same ctor kwargs and parameter count as reference ``vit_baseline.py:13-68``.
    """

    dim: int = 256
    depth: int = 6
    heads: int = 4
    mlp_ratio: float = 4.0
    n_classes: int = 10
    drop_path: float = 0.1
    patch: int = 4
    img_size: int = 32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        assert self.dim % self.heads == 0, (
            f"dim {self.dim} not divisible by heads {self.heads}"
        )
        num_tokens = (self.img_size // self.patch) ** 2
        tok, _ = ViTEncoder(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            drop_path=self.drop_path,
            patch=self.patch,
            num_tokens=num_tokens,
            name="enc",
        )(x, train=train)
        pooled = jnp.mean(tok, axis=1)
        return Linear(self.n_classes, use_bias=False, name="cls")(pooled)
