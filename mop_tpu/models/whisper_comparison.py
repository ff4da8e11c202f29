"""Whisper comparison framework: Baseline vs MoP (TPU-native).

Parity target: reference ``mop/models/whisper_comparison.py`` — two-way
builder with parameter accounting and audio forward smoke tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .whisper_mop import WhisperConfig, create_whisper_baseline, create_whisper_mop


@dataclass
class WhisperComparisonConfig:
    """Reference ``whisper_comparison.py:18-40``."""

    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_layer: int = 12
    n_head: int = 20
    n_embd: int = 1280
    dropout: float = 0.0
    bias: bool = False
    n_views: int = 5
    n_kernels: int = 3
    kernel_size: int = 5
    vocab_size: int = 51865
    use_abs_pos_emb: bool = True


def _count(tree) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


class WhisperComparisonFramework:
    """Two-way Baseline/MoP comparison (reference :43-341)."""

    def __init__(self, config: WhisperComparisonConfig):
        self.config = config
        self.models: Dict[str, object] = {}
        self.param_counts: Dict[str, int] = {}
        self.params: Dict[str, object] = {}

    def _whisper_config(self) -> WhisperConfig:
        c = self.config
        return WhisperConfig(
            n_mels=c.n_mels,
            n_audio_ctx=c.n_audio_ctx,
            n_layer_enc=c.n_layer,
            n_layer_dec=c.n_layer,
            n_head=c.n_head,
            n_embd=c.n_embd,
            n_text_ctx=c.n_audio_ctx,  # reference uses audio ctx for text ctx
            dropout=c.dropout,
            bias=c.bias,
            n_views=c.n_views,
            n_kernels=c.n_kernels,
            kernel_size=c.kernel_size,
            vocab_size=c.vocab_size,
            use_abs_pos_emb=c.use_abs_pos_emb,
        )

    def build_models(self) -> Dict[str, object]:
        cfg = self._whisper_config()
        self.models = {
            "baseline": create_whisper_baseline(cfg),
            "mop": create_whisper_mop(cfg),
        }
        mel = jnp.zeros((1, 8, cfg.n_mels))
        ids = jnp.zeros((1, 8), jnp.int32)
        self.param_counts = {
            name: _count(
                jax.eval_shape(lambda m=m: m.init(jax.random.PRNGKey(0), mel, ids))
            )
            for name, m in self.models.items()
        }
        return self.models

    def init_params(self, seed: int = 0, t_audio: int = 8, t_text: int = 8):
        cfg = self._whisper_config()
        mel = jnp.zeros((1, t_audio, cfg.n_mels))
        ids = jnp.zeros((1, t_text), jnp.int32)
        self.params = {
            name: m.init(jax.random.PRNGKey(seed), mel, ids)
            for name, m in self.models.items()
        }
        return self.params

    def parameter_matching_analysis(self) -> Dict:
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

    def test_forward_pass(
        self, batch_size: int = 2, t_audio: int = 16, t_text: int = 16
    ) -> Dict[str, Dict]:
        """Forward smoke test (reference :184-233)."""
        cfg = self._whisper_config()
        rng = jax.random.PRNGKey(0)
        mel = jax.random.normal(rng, (batch_size, t_audio, cfg.n_mels))
        ids = jax.random.randint(rng, (batch_size, t_text), 0, cfg.vocab_size)
        tgt = jax.random.randint(
            jax.random.fold_in(rng, 1), (batch_size, t_text), 0, cfg.vocab_size
        )
        results = {}
        for name, m in self.models.items():
            try:
                params = self.params.get(name) or m.init(rng, mel, ids)
                logits, loss, gates = m.apply(params, mel, ids, targets=tgt)
                results[name] = {
                    "logits_shape": tuple(logits.shape),
                    "loss_value": float(loss) if loss is not None else None,
                    "gates_shape": tuple(gates.shape),
                }
            except Exception as e:  # noqa: BLE001 - mirror reference
                results[name] = {"error": str(e)}
        return results

    def test_audio_processing(self, t_audio: int = 24) -> Dict[str, Dict]:
        """Gate-map extraction on synthetic spectrograms (reference :234-285)."""
        cfg = self._whisper_config()
        mel = jnp.zeros((1, t_audio, cfg.n_mels))
        # Diagonal + stripe patterns, as the reference test constructs.
        idx = jnp.arange(min(t_audio, cfg.n_mels))
        mel = mel.at[0, idx, idx].set(1.0)
        mel = mel.at[0, :, min(8, cfg.n_mels - 1)].add(0.5)
        results = {}
        for name, m in self.models.items():
            params = self.params.get(name) or m.init(jax.random.PRNGKey(0), mel, jnp.zeros((1, 4), jnp.int32))
            gates = m.apply(params, mel, method=m.get_gate_maps)
            results[name] = {"gates_shape": tuple(gates.shape)}
        return results

    def print_comparison_summary(self):
        print("=" * 80)
        print("WHISPER MODEL COMPARISON: Baseline vs MoP")
        print("=" * 80)
        for name, count in self.param_counts.items():
            print(f"{name:>10}: {count:>12,} ({count / 1e6:>6.2f}M)")
        analysis = self.parameter_matching_analysis()
        for name, comp in analysis["comparisons"].items():
            status = "MATCHED" if comp["is_matched"] else "MISMATCHED"
            print(
                f"{name:>10}: {comp['difference']:+,} ({comp['difference_pct']:+.2f}%) {status}"
            )
        print("=" * 80)


def create_whisper_comparison_framework(
    config: WhisperComparisonConfig,
) -> WhisperComparisonFramework:
    return WhisperComparisonFramework(config)
