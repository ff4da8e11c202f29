"""GPT comparison framework: Baseline vs Quartet vs MoP (TPU-native).

Parity target: reference ``mop/models/gpt_comparison.py`` — three-way builder
with parameter matching, component breakdown, and forward-pass smoke tests.
JAX adaptation: models are stateless defs; the framework owns initialized
params per model (abstract ``eval_shape`` init for counting, so no weights are
materialized just to count parameters).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .gpt_mop import create_gpt_baseline, create_gpt_mop, create_gpt_quartet
from .quartet_attn_patch import TransformerConfig


@dataclass
class ComparisonConfig:
    """Reference ``gpt_comparison.py:18-31``."""

    n_layer: int = 8
    n_head: int = 8
    n_embd: int = 640
    dropout: float = 0.1
    block_size: int = 256
    bias: bool = False
    n_views: int = 5
    n_kernels: int = 3
    quartet_gate_init: float = -5.0
    quartet_scale: float = 1.0


def _abstract_params(model, sample_idx):
    """Shape-only init — counts params without allocating weights."""
    return jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), sample_idx, train=False)
    )


def _count(tree) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


class GPTComparisonFramework:
    """Three-way Baseline/Quartet/MoP comparison (reference :34-278)."""

    def __init__(self, config: ComparisonConfig):
        self.config = config
        self.models: Dict[str, object] = {}
        self.param_counts: Dict[str, int] = {}
        self.params: Dict[str, object] = {}

    def build_models(self, vocab_size: int) -> Dict[str, object]:
        c = self.config
        base_config = TransformerConfig(
            n_layer=c.n_layer, n_head=c.n_head, n_embd=c.n_embd, dropout=c.dropout,
            block_size=c.block_size, bias=c.bias, use_quartet=False,
        )
        quartet_config = TransformerConfig(
            n_layer=c.n_layer, n_head=c.n_head, n_embd=c.n_embd, dropout=c.dropout,
            block_size=c.block_size, bias=c.bias, use_quartet=True,
            quartet_gate_init=c.quartet_gate_init, quartet_scale=c.quartet_scale,
        )
        self.models = {
            "baseline": create_gpt_baseline(vocab_size, base_config),
            "quartet": create_gpt_quartet(vocab_size, quartet_config),
            "mop": create_gpt_mop(
                vocab_size, base_config, n_views=c.n_views, n_kernels=c.n_kernels
            ),
        }
        sample = jnp.zeros((1, min(16, c.block_size)), jnp.int32)
        self.param_counts = {
            name: _count(_abstract_params(m, sample))
            for name, m in self.models.items()
        }
        return self.models

    def init_params(self, seed: int = 0, seq_len: int = 16) -> Dict[str, object]:
        """Materialize parameters for every model (separate from counting)."""
        sample = jnp.zeros((1, min(seq_len, self.config.block_size)), jnp.int32)
        self.params = {
            name: m.init(jax.random.PRNGKey(seed), sample, train=False)
            for name, m in self.models.items()
        }
        return self.params

    def get_param_summary(self) -> Dict[str, Dict]:
        summary = {}
        for name, m in self.models.items():
            count = self.param_counts[name]
            summary[name] = {
                "total_params": count,
                "total_millions": count / 1e6,
                "components": self._count_params_by_component(name),
            }
        return summary

    def _count_params_by_component(self, name: str) -> Dict[str, int]:
        """Component breakdown by param-path substring (reference :110-137)."""
        import flax

        sample = jnp.zeros((1, min(16, self.config.block_size)), jnp.int32)
        tree = _abstract_params(self.models[name], sample)
        flat = flax.traverse_util.flatten_dict(tree["params"] if "params" in tree else tree)
        components = {
            "embeddings": 0, "attention": 0, "mlp": 0, "layer_norm": 0,
            "lm_head": 0, "mop_components": 0,
        }
        for path, leaf in flat.items():
            pname = "/".join(str(p) for p in path)
            n = int(np.prod(leaf.shape))
            if "wte" in pname or "wpe" in pname:
                components["embeddings"] += n
            elif "attn" in pname:
                components["attention"] += n
            elif "mlp" in pname or "fc" in pname or "proj" in pname:
                if "views" in pname or "kernels" in pname or "fuse" in pname:
                    components["mop_components"] += n
                else:
                    components["mlp"] += n
            elif "ln" in pname:
                components["layer_norm"] += n
        return components

    def parameter_matching_analysis(self) -> Dict:
        """'Matched' = within 1% of baseline (reference :139-157)."""
        baseline_params = self.param_counts["baseline"]
        analysis = {"baseline_params": baseline_params, "comparisons": {}}
        for name, params in self.param_counts.items():
            if name == "baseline":
                continue
            diff = params - baseline_params
            diff_pct = (diff / baseline_params) * 100
            analysis["comparisons"][name] = {
                "params": params,
                "difference": diff,
                "difference_pct": diff_pct,
                "is_matched": abs(diff_pct) < 1.0,
            }
        return analysis

    def get_model_info(self) -> Dict[str, Dict]:
        info = {}
        for name, m in self.models.items():
            cfg = getattr(m, "config", None)
            info[name] = {
                "class": m.__class__.__name__,
                "config": (
                    {
                        "n_layer": getattr(cfg, "n_layer", None),
                        "n_head": getattr(cfg, "n_head", None),
                        "n_embd": getattr(cfg, "n_embd", None),
                        "block_size": getattr(cfg, "block_size", None),
                        "use_quartet": getattr(cfg, "use_quartet", None),
                    }
                    if cfg
                    else None
                ),
                "has_mop": hasattr(m, "get_gate_maps"),
                "param_count": self.param_counts[name],
            }
        return info

    def test_forward_pass(
        self, batch_size: int = 2, seq_len: int = 64, vocab_size: int = 1000
    ) -> Dict[str, Dict]:
        """Forward smoke test for all models (reference :185-233)."""
        rng = jax.random.PRNGKey(0)
        x = jax.random.randint(rng, (batch_size, seq_len), 0, vocab_size)
        y = jax.random.randint(jax.random.fold_in(rng, 1), (batch_size, seq_len), 0, vocab_size)
        results = {}
        for name, m in self.models.items():
            try:
                params = self.params.get(name) or m.init(rng, x, train=False)
                logits, loss = m.apply(params, x, targets=y, train=False)
                results[name] = {
                    "logits": logits,
                    "loss": loss,
                    "logits_shape": tuple(logits.shape),
                    "loss_value": float(loss) if loss is not None else None,
                }
                if hasattr(m, "get_gate_maps"):
                    try:
                        gates, views, kernels = m.apply(
                            params, x, method=m.get_gate_maps
                        )
                        results[name]["mop_maps"] = {
                            "gates_shape": tuple(gates.shape),
                            "views_shape": tuple(views.shape),
                            "kernels_shape": tuple(kernels.shape),
                        }
                    except Exception as e:  # noqa: BLE001 - mirror reference
                        results[name]["mop_maps_error"] = str(e)
            except Exception as e:  # noqa: BLE001 - mirror reference
                results[name] = {"error": str(e)}
        return results

    def print_comparison_summary(self):
        print("=" * 80)
        print("GPT MODEL COMPARISON: Baseline vs Quartet vs MoP")
        print("=" * 80)
        print("\nPARAMETER COUNTS:")
        for name, count in self.param_counts.items():
            print(f"{name:>10}: {count:>12,} ({count / 1e6:>6.2f}M)")
        analysis = self.parameter_matching_analysis()
        print(f"\nPARAMETER MATCHING (Baseline: {analysis['baseline_params']:,}):")
        for name, comp in analysis["comparisons"].items():
            status = "MATCHED" if comp["is_matched"] else "MISMATCHED"
            print(
                f"{name:>10}: {comp['difference']:+,} ({comp['difference_pct']:+.2f}%) {status}"
            )
        print("=" * 80)


def create_comparison_framework(config: ComparisonConfig) -> GPTComparisonFramework:
    return GPTComparisonFramework(config)
