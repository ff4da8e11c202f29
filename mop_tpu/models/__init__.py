"""Model implementations for mop-tpu (Mixture of Products, TPU-native).

Mirrors the public surface of reference ``mop/models/__init__.py``:
ViT (baseline/MoP/variants), GPT (Quartet/MoP), Whisper (MoP), the unified
attention-variant zoo, and the comparison frameworks.
"""

from .attention_variants import (
    BaselineMSA,
    CrossViewMixerMSA,
    EdgewiseGateHead,
    EdgewiseMSA,
    MultiHopMSA,
    UnifiedMSA,
)
from .components import (
    MLP,
    MSA,
    Block,
    BlockMoE,
    DropPath,
    FuseExcInh,
    Kernels3,
    MoEMLP,
    PatchEmbed,
    ViewsLinear,
    ViTEncoder,
    ViTEncoderMoE,
)
from .vit_baseline import ViT_Baseline
from .vit_mop import ViT_MoP
from .vit_variants import (
    DualPathMSA,
    ViTCrossView,
    ViTEdgewise,
    ViTGated,
    ViTMultiHop,
)

__all__ = [
    "ViT_MoP",
    "ViT_Baseline",
    "ViTEdgewise",
    "ViTCrossView",
    "ViTMultiHop",
    "ViTGated",
    "DualPathMSA",
    # Core MoP components
    "ViewsLinear",
    "Kernels3",
    "FuseExcInh",
    "MoEMLP",
    # Transformer components
    "ViTEncoder",
    "ViTEncoderMoE",
    "PatchEmbed",
    "MSA",
    "MLP",
    "Block",
    "BlockMoE",
    "DropPath",
    # Attention variants
    "BaselineMSA",
    "CrossViewMixerMSA",
    "MultiHopMSA",
    "EdgewiseMSA",
    "EdgewiseGateHead",
    "UnifiedMSA",
]
