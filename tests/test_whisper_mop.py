"""Whisper-MoP contract (reference ``tests/test_whisper_mop.py``)."""

import jax
import jax.numpy as jnp
import numpy as np

from mop_tpu.models import (
    WhisperConfig,
    WhisperMoP,
    create_whisper_baseline,
    create_whisper_mop,
)


def _count(tree):
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


def test_individual_models():
    config = WhisperConfig(
        n_layer_enc=2, n_layer_dec=2, n_head=4, n_embd=128, n_mels=40,
        n_audio_ctx=128, n_text_ctx=64, dropout=0.1, bias=False,
        n_views=3, n_kernels=2, kernel_size=3, vocab_size=256,
    )
    rng = jax.random.PRNGKey(0)
    mel = jnp.zeros((1, 8, config.n_mels))
    ids = jnp.zeros((1, 8), jnp.int32)
    baseline = create_whisper_baseline(config)
    mop = create_whisper_mop(config)
    nb = _count(baseline.init(rng, mel, ids))
    nm = _count(mop.init(rng, mel, ids))
    assert nb > 0 and nm > 0
    assert nb == nm  # same architecture; baseline only zeroes alphas


def test_forward_pass():
    vocab_size = 100
    config = WhisperConfig(
        n_layer_enc=2, n_layer_dec=2, n_head=2, n_embd=64, n_mels=16,
        n_audio_ctx=32, n_text_ctx=32, dropout=0.1, bias=False,
        n_views=2, n_kernels=1, kernel_size=3, vocab_size=vocab_size,
    )
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (2, 16, config.n_mels))
    ids = jax.random.randint(rng, (2, 16), 0, vocab_size)
    targets = jax.random.randint(jax.random.fold_in(rng, 1), (2, 16), 0, vocab_size)

    for factory in (create_whisper_baseline, create_whisper_mop):
        m = factory(config)
        params = m.init(rng, mel, ids)
        logits, loss, gates = m.apply(params, mel, ids, targets=targets)
        assert logits.shape[0] == 2 and loss is not None and gates is not None
        assert bool(jnp.isfinite(loss))


def test_baseline_gate_is_identity():
    """Baseline factory zeroes alphas -> gate == 1 everywhere (reference :431-437)."""
    config = WhisperConfig(
        n_layer_enc=2, n_layer_dec=2, n_head=2, n_embd=64, n_mels=16,
        n_audio_ctx=32, n_text_ctx=32, n_views=2, n_kernels=1,
        kernel_size=3, vocab_size=64,
    )
    m = create_whisper_baseline(config)
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (1, 12, config.n_mels))
    params = m.init(rng, mel, jnp.zeros((1, 4), jnp.int32))
    gates = m.apply(params, mel, method=m.get_gate_maps)
    assert jnp.allclose(gates, 1.0)


def test_audio_processing():
    config = WhisperConfig(
        n_layer_enc=2, n_layer_dec=2, n_head=2, n_embd=64, n_mels=16,
        n_audio_ctx=32, n_text_ctx=32, dropout=0.1, bias=False,
        n_views=2, n_kernels=1, kernel_size=3, vocab_size=128,
    )
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (2, 24, config.n_mels))
    ids = jax.random.randint(rng, (2, 12), 0, config.vocab_size)
    m = create_whisper_mop(config)
    params = m.init(rng, mel, ids)
    logits, loss, gates = m.apply(params, mel, ids)
    assert logits.ndim == 3 and gates is not None


def test_temporal_spectral_patterns():
    config = WhisperConfig(
        n_layer_enc=2, n_layer_dec=2, n_head=2, n_embd=64, n_mels=16,
        n_audio_ctx=32, n_text_ctx=32, n_views=3, n_kernels=2,
        kernel_size=5, vocab_size=128,
    )
    m = create_whisper_mop(config)
    b, t, f = 1, 24, config.n_mels
    mel = jnp.zeros((b, t, f))
    idx = jnp.arange(min(t, f))
    mel = mel.at[0, idx, idx].set(1.0)
    mel = mel.at[0, :, 8].add(0.5)
    mel = mel.at[0, 12, :].add(0.3)
    params = m.init(jax.random.PRNGKey(0), mel, jnp.zeros((1, 4), jnp.int32))
    gates = m.apply(params, mel, method=m.get_gate_maps)
    assert gates.shape[0] == b and gates.shape[-1] == t
