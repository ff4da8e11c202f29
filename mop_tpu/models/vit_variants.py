"""ViT model wrappers around the attention-variant zoo.

The reference defines these inside experiment scripts (ViTEdgewise in
``experiments/cifar100_edgewise_gates.py:377``, ViTCrossView in
``experiments/cifar100_crossview_mixer.py:226``, ViTMultiHop in
``experiments/cifar100_multihop_gates.py:198``, ViTGated in
``experiments/cifar100_twohop_gates.py``); here they are first-class library
models sharing one backbone. All are: patchify + learned pos + pre-LN blocks
with the given MSA + final LN + mean-pool + bias-free head.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import attention as A
from ..ops import fused as F
from ..config import use_fused_attention, use_fused_multihop
from .attention_variants import (
    CrossViewMixerMSA,
    EdgewiseMSA,
    MultiHopMSA,
    UnifiedMSA,
)
from .components import MLP, DropPath, PatchEmbed
from .layers import LayerNorm, Linear, normal_init

Array = jax.Array


class DualPathMSA(nn.Module):
    """Two-hop dual-path MSA with fixed scalar logic gates (reference
    ``experiments/cifar10_twohop_gates.py:102-167``). Unlike MultiHopMSA the
    base path is scaled by ``gates['base']``."""

    dim: int
    heads: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    beta_not: float = 0.5
    gates: Optional[Dict[str, float]] = None

    @nn.compact
    def __call__(
        self, x: Array, attn_mask: Optional[Array] = None, train: bool = False
    ) -> Array:
        from .attention_variants import _merge_heads, _qkv

        gates = self.gates or dict(and_=1.0, or_=0.0, not_=0.0, chain=0.0, base=1.0)
        h = self.heads
        q1, k1, v1 = _qkv(x, h, Linear(self.dim * 3, use_bias=False, name="qkv1"))
        q2, k2, v2 = _qkv(x, h, Linear(self.dim * 3, use_bias=False, name="qkv2"))
        w = jax.nn.sigmoid(
            self.param("chain_value_logit", lambda k, s: jnp.asarray(-2.0), ())
        )
        if use_fused_multihop() and attn_mask is None and not train:
            # Two-hop == multihop kernel with hops=2 (+ base-scaled S1).
            # Inference-only (see MultiHopMSA note on recompute backward).
            y = F.fused_multihop_attention(
                q1, k1, v1, q2, k2, v2, gates=dict(gates),
                beta_not=self.beta_not, hops=2, chain_w=w,
            )
        else:
            s1 = A.scaled_scores(q1, k1)
            s2 = A.scaled_scores(q2, k2)
            a1 = A.masked_softmax(s1, attn_mask)
            a2 = A.masked_softmax(s2, attn_mask)
            c_right = A.chain_product([a1, a2])
            smix = gates["base"] * s1
            smix = smix + gates["and_"] * s2
            smix = smix + gates["or_"] * (A.lse_pair(s1, s2) - s1)
            smix = smix - gates["not_"] * (self.beta_not * s2)
            smix = smix + gates["chain"] * jnp.log(c_right + 1e-6)
            att = A.masked_softmax(smix, attn_mask)
            att = nn.Dropout(self.attn_drop, deterministic=not train)(att)
            y_base = jnp.einsum("bhnm,bhmd->bhnd", att.astype(v1.dtype), v1)
            y_chain = jnp.einsum(
                "bhnm,bhmd->bhnd",
                a1.astype(v2.dtype),
                jnp.einsum("bhnm,bhmd->bhnd", a2.astype(v2.dtype), v2),
            )
            y = y_base + w * y_chain
        y = Linear(self.dim, use_bias=False, name="proj")(_merge_heads(y))
        return nn.Dropout(self.proj_drop, deterministic=not train)(y)


class _VariantBlock(nn.Module):
    """Pre-LN block hosting an arbitrary MSA module instance."""

    dim: int
    mlp_ratio: float
    drop: float
    drop_path: float
    msa: nn.Module

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        y = self.msa(LayerNorm(name="ln1")(x), train=train)
        x = x + DropPath(self.drop_path, name="dp1")(y, train=train)
        y = MLP(self.dim, self.mlp_ratio, self.drop, name="mlp")(
            LayerNorm(name="ln2")(x), train=train
        )
        x = x + DropPath(self.drop_path, name="dp2")(y, train=train)
        return x


class _VariantViT(nn.Module):
    """Shared ViT backbone; subclasses provide a per-depth MSA factory."""

    dim: int = 256
    depth: int = 6
    heads: int = 4
    n_classes: int = 100
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path: float = 0.1
    patch: int = 4
    num_tokens: int = 64

    def _make_msa(self) -> nn.Module:  # pragma: no cover - abstract
        raise NotImplementedError

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        tok, _ = PatchEmbed(dim=self.dim, patch=self.patch, name="patch")(x)
        pos = self.param("pos", normal_init(0.02), (1, self.num_tokens, self.dim))
        tok = tok + pos
        dps = [float(v) for v in np.linspace(0.0, self.drop_path, self.depth)]
        for i in range(self.depth):
            tok = _VariantBlock(
                self.dim,
                self.mlp_ratio,
                self.drop,
                dps[i],
                msa=self._make_msa(),
                name=f"blocks_{i}",
            )(tok, train=train)
        tok = LayerNorm(name="ln_f")(tok)
        return Linear(self.n_classes, use_bias=False, name="head")(
            jnp.mean(tok, axis=1)
        )


class ViTEdgewise(_VariantViT):
    """Mode-E ViT (reference ``experiments/cifar100_edgewise_gates.py:376-450``)."""

    beta_not: float = 0.5
    use_k3: bool = False
    n_views: int = 2
    share_qkv: bool = False
    gate_mode: str = "dense"
    gate_rank: int = 4
    gate_init: str = "neutral"
    use_lens_bank: bool = False
    lens_kernel_size: int = 3
    lens_dilations: Optional[Tuple[int, ...]] = None
    use_lens_bank_qk: bool = False
    lens_qk_kernel_size: int = 3
    lens_qk_dilations: Optional[Tuple[int, ...]] = None
    lens_qk_causal: bool = False

    def _make_msa(self) -> nn.Module:
        return EdgewiseMSA(
            self.dim,
            self.heads,
            0.0,
            self.drop,
            beta_not=self.beta_not,
            use_k3=self.use_k3,
            n_views=self.n_views,
            share_qkv=self.share_qkv,
            gate_mode=self.gate_mode,
            gate_rank=self.gate_rank,
            gate_init=self.gate_init,
            use_lens_bank=self.use_lens_bank,
            lens_kernel_size=self.lens_kernel_size,
            lens_dilations=self.lens_dilations,
            use_lens_bank_qk=self.use_lens_bank_qk,
            lens_qk_kernel_size=self.lens_qk_kernel_size,
            lens_qk_dilations=self.lens_qk_dilations,
            lens_qk_causal=self.lens_qk_causal,
        )


class ViTCrossView(_VariantViT):
    """Mode-C ViT (reference ``experiments/cifar100_crossview_mixer.py:226-289``)."""

    use_transpose_cues: bool = True
    t1: float = 0.0
    t2: float = 0.0
    enable_per_key_prior: bool = False
    prior_weight: float = 0.5
    anchor_mode: str = "argmax_row_sum"
    fixed_k_star: int = 0

    def _make_msa(self) -> nn.Module:
        return CrossViewMixerMSA(
            self.dim,
            self.heads,
            0.0,
            self.drop,
            use_transpose_cues=self.use_transpose_cues,
            t1=self.t1,
            t2=self.t2,
            enable_per_key_prior=self.enable_per_key_prior,
            prior_weight=self.prior_weight,
            anchor_mode=self.anchor_mode,
            fixed_k_star=self.fixed_k_star,
        )


class ViTMultiHop(_VariantViT):
    """Mode-D ViT (reference ``experiments/cifar100_multihop_gates.py:198-246``)."""

    beta_not: float = 0.5
    gates: Optional[Dict[str, float]] = None
    hops: int = 3

    def _make_msa(self) -> nn.Module:
        return MultiHopMSA(
            self.dim,
            self.heads,
            0.0,
            self.drop,
            beta_not=self.beta_not,
            gates=self.gates,
            hops=self.hops,
        )


class ViTGated(_VariantViT):
    """Two-hop dual-path gated ViT (reference ``experiments/cifar10_twohop_gates.py``)."""

    beta_not: float = 0.5
    gates: Optional[Dict[str, float]] = None

    def _make_msa(self) -> nn.Module:
        return DualPathMSA(
            self.dim,
            self.heads,
            0.0,
            self.drop,
            beta_not=self.beta_not,
            gates=self.gates,
        )
