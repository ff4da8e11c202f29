"""Comparison-framework surfaces (reference gpt_comparison / whisper_comparison)."""

import jax
import jax.numpy as jnp

from mop_tpu.models import (
    ComparisonConfig,
    WhisperComparisonConfig,
    create_comparison_framework,
    create_whisper_comparison_framework,
)


def test_gpt_comparison_full_surface(capsys):
    cfg = ComparisonConfig(n_layer=2, n_head=2, n_embd=64, block_size=32,
                           n_views=2, n_kernels=1)
    fw = create_comparison_framework(cfg)
    fw.build_models(vocab_size=120)
    summary = fw.get_param_summary()
    assert set(summary) == {"baseline", "quartet", "mop"}
    for s in summary.values():
        assert s["total_params"] > 0 and "components" in s
    info = fw.get_model_info()
    assert info["mop"]["has_mop"] and not info["baseline"]["has_mop"]
    fw.print_comparison_summary()
    out = capsys.readouterr().out
    assert "PARAMETER MATCHING" in out
    results = fw.test_forward_pass(batch_size=2, seq_len=16, vocab_size=120)
    for name, r in results.items():
        assert "error" not in r, (name, r)
        assert r["loss_value"] is not None
    assert "mop_maps" in results["mop"]


def test_whisper_comparison_full_surface():
    cfg = WhisperComparisonConfig(
        n_layer=2, n_head=2, n_embd=64, n_mels=16, n_audio_ctx=32,
        n_views=2, n_kernels=1, kernel_size=3, vocab_size=80,
    )
    fw = create_whisper_comparison_framework(cfg)
    fw.build_models()
    assert fw.param_counts["baseline"] == fw.param_counts["mop"]
    analysis = fw.parameter_matching_analysis()
    assert analysis["comparisons"]["mop"]["is_matched"]
    results = fw.test_forward_pass(batch_size=2, t_audio=8, t_text=8)
    for name, r in results.items():
        assert "error" not in r, (name, r)
    audio = fw.test_audio_processing(t_audio=16)
    assert audio["mop"]["gates_shape"][0] == 1
