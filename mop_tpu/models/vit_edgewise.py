"""ViTEdgewise re-export (canonical home: ``mop_tpu.models.vit_variants``).

Kept as its own module to mirror the reference layout where ViTEdgewise lives
in ``experiments/cifar100_edgewise_gates.py`` and is imported across runners.
"""

from .vit_variants import ViTEdgewise

__all__ = ["ViTEdgewise"]
