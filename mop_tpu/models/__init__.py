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
from .beam import generate_beam, whisper_transcribe_beam
from .generate import (decode_chunk, generate, generate_cached,
                       whisper_transcribe, whisper_transcribe_auto,
                       whisper_transcribe_cached)
from .speculative import speculative_generate
from .gpt_comparison import (
    ComparisonConfig,
    GPTComparisonFramework,
    create_comparison_framework,
)
from .gpt_mop import (
    GPT_MoP,
    FuseExcInh1D,
    Kernels1D,
    MoPBlock,
    ViewsLinear1D,
    create_gpt_baseline,
    create_gpt_mop,
    create_gpt_mop_causal,
    create_gpt_quartet,
)
from .quartet_attn_patch import (
    CausalSelfAttention,
    TinyTransformerLM,
    TransformerConfig,
)
from .vit_baseline import ViT_Baseline
from .vit_mop import ViT_MoP
from .whisper_comparison import (
    WhisperComparisonConfig,
    WhisperComparisonFramework,
    create_whisper_comparison_framework,
)
from .whisper_mop import (
    DecoderBlock,
    EncoderBlock,
    FuseExcInh2D,
    Kernels2D,
    MoP2D,
    ViewsConv2D,
    WhisperConfig,
    WhisperMoP,
    create_whisper_baseline,
    create_whisper_mop,
)
from .vit_localizer import ViTLocalizer, bbox_iou, smooth_l1
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
    "ViTLocalizer",
    "bbox_iou",
    "smooth_l1",
    # GPT family
    "GPT_MoP",
    "create_gpt_mop",
    "create_gpt_mop_causal",
    "create_gpt_baseline",
    "create_gpt_quartet",
    "TransformerConfig",
    "TinyTransformerLM",
    "CausalSelfAttention",
    "ViewsLinear1D",
    "Kernels1D",
    "FuseExcInh1D",
    "MoPBlock",
    "decode_chunk",
    "generate",
    "generate_beam",
    "generate_cached",
    "speculative_generate",
    "whisper_transcribe",
    "whisper_transcribe_auto",
    "whisper_transcribe_beam",
    "whisper_transcribe_cached",
    # Whisper family
    "WhisperMoP",
    "create_whisper_mop",
    "create_whisper_baseline",
    "WhisperConfig",
    "ViewsConv2D",
    "Kernels2D",
    "FuseExcInh2D",
    "MoP2D",
    "EncoderBlock",
    "DecoderBlock",
    # Comparison frameworks
    "GPTComparisonFramework",
    "ComparisonConfig",
    "create_comparison_framework",
    "WhisperComparisonFramework",
    "WhisperComparisonConfig",
    "create_whisper_comparison_framework",
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
