"""mop-tpu: a TPU-native (JAX/XLA/Pallas/pjit) Mixture-of-Products framework.

From-scratch rebuild of the capabilities of Eran-BA/MoP with a TPU-first
design: fused attention-score boolean logic, on-device input pipelines, and
data-parallel sharding over ICI. See SURVEY.md for the reference analysis.
"""

from .models import ViT_Baseline, ViT_MoP

__all__ = ["ViT_Baseline", "ViT_MoP"]
__version__ = "0.1.0"
