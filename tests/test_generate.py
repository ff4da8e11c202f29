"""GPT autoregressive sampler (beyond-reference capability)."""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from mop_tpu.models import TransformerConfig, create_gpt_mop, create_gpt_quartet
from mop_tpu.models.generate import generate


def _setup():
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=16, bias=False)
    model = create_gpt_quartet(40, cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(0), (2, 4), 0, 40)
    params = model.init(jax.random.PRNGKey(1), prompt)
    return model, params, prompt


def test_greedy_generation_shapes_and_determinism():
    model, params, prompt = _setup()
    out1 = generate(model, params, prompt, max_new_tokens=8)
    out2 = generate(model, params, prompt, max_new_tokens=8)
    assert out1.shape == (2, 12)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(out1[:, :4]), np.asarray(prompt))
    assert int(out1.max()) < 40 and int(out1.min()) >= 0


def test_generation_beyond_block_size():
    model, params, prompt = _setup()
    out = generate(model, params, prompt, max_new_tokens=20)  # 4+20 > block 16
    assert out.shape == (2, 24)
    assert bool(jnp.all((out >= 0) & (out < 40)))


def test_sampled_generation_respects_top_k():
    model, params, prompt = _setup()
    out = generate(model, params, prompt, max_new_tokens=6,
                   rng=jax.random.PRNGKey(3), temperature=0.8, top_k=5)
    assert out.shape == (2, 10)


def test_generate_works_for_gpt_mop():
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=16, bias=False)
    model = create_gpt_mop(40, cfg, n_views=2, n_kernels=1)
    prompt = jnp.zeros((1, 3), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt)
    out = generate(model, params, prompt, max_new_tokens=5)
    assert out.shape == (1, 8)


def test_whisper_transcribe_greedy():
    from mop_tpu.models import WhisperConfig, create_whisper_mop
    from mop_tpu.models.generate import whisper_transcribe

    cfg = WhisperConfig(n_layer_enc=1, n_layer_dec=1, n_head=2, n_embd=32,
                        n_mels=16, n_audio_ctx=16, n_text_ctx=8, dropout=0.0,
                        bias=False, n_views=2, n_kernels=1, kernel_size=3,
                        vocab_size=20)
    model = create_whisper_mop(cfg)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16))
    params = model.init(jax.random.PRNGKey(1), mel, jnp.zeros((2, 4), jnp.int32))
    out = whisper_transcribe(model, params, mel, bos_token=19, max_tokens=6)
    assert out.shape == (2, 6)
    assert bool(jnp.all((out >= 0) & (out < 20)))
    # deterministic
    out2 = whisper_transcribe(model, params, mel, bos_token=19, max_tokens=6)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_generate_cached_prefill_is_exact_on_prompt():
    """The cached sampler's dense prefill must equal model.apply on the
    prompt bit-for-bit (same prefix-standardization math) — the exactness
    anchor for the approximate KV-cache mode."""
    import numpy as np

    from mop_tpu.models import TransformerConfig, create_gpt_quartet
    from mop_tpu.models.generate import prefill

    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=16)
    model = create_gpt_quartet(50, cfg)
    idx = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, 50)
    params = model.init(jax.random.PRNGKey(1), idx)
    lg, cache = prefill(model, params, idx)
    dense, _ = model.apply(params, idx, train=False)
    np.testing.assert_array_equal(np.asarray(lg), np.asarray(dense[:, -1]))
    assert int(cache["len"]) == 8


def test_generate_cached_shapes_and_determinism():
    import numpy as np

    from mop_tpu.models import (TransformerConfig, create_gpt_baseline,
                                generate_cached)

    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=16)
    model = create_gpt_baseline(50, cfg)
    idx = jax.random.randint(jax.random.PRNGKey(0), (2, 6), 0, 50)
    params = model.init(jax.random.PRNGKey(1), idx)
    a = generate_cached(model, params, idx, max_new_tokens=8)
    b = generate_cached(model, params, idx, max_new_tokens=8)
    assert a.shape == (2, 14)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a[:, :6]), np.asarray(idx))


def test_generate_cached_rejects_window_overflow():
    import pytest

    from mop_tpu.models import (TransformerConfig, create_gpt_baseline,
                                generate_cached)

    cfg = TransformerConfig(n_layer=1, n_head=2, n_embd=32, dropout=0.0,
                            block_size=8)
    model = create_gpt_baseline(50, cfg)
    idx = jax.random.randint(jax.random.PRNGKey(0), (1, 6), 0, 50)
    params = model.init(jax.random.PRNGKey(1), idx)
    with pytest.raises(ValueError, match="exceeds block_size"):
        generate_cached(model, params, idx, max_new_tokens=4)


def test_whisper_transcribe_cached_matches_uncached():
    """The Whisper decoder is a standard causal transformer (no pre-mask
    standardization), so the KV-cached transcription is EXACT — token-level
    equality with whisper_transcribe."""
    import numpy as np

    from mop_tpu.models import (WhisperConfig, create_whisper_mop,
                                whisper_transcribe,
                                whisper_transcribe_cached)

    wc = WhisperConfig(n_mels=16, n_audio_ctx=24, vocab_size=40,
                       n_text_ctx=16, n_embd=32, n_head=2,
                       n_layer_enc=2, n_layer_dec=2, dropout=0.0)
    model = create_whisper_mop(wc)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 16))
    ids0 = jnp.zeros((2, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), mel, ids0)
    a = whisper_transcribe(model, params, mel, bos_token=3, max_tokens=8)
    b = whisper_transcribe_cached(model, params, mel, bos_token=3,
                                  max_tokens=8)
    assert b.shape == (2, 8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_top_p_tiny_nucleus_equals_greedy():
    """top_p small enough keeps only the top token -> equals greedy even
    at high temperature, for both the full-window and cached samplers."""
    from mop_tpu.models import generate_cached

    model, params, prompt = _setup()
    ref = generate(model, params, prompt, max_new_tokens=8)
    out = generate(model, params, prompt, max_new_tokens=8,
                   rng=jax.random.PRNGKey(3), temperature=3.0, top_p=1e-9)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    ref_c = generate_cached(model, params, prompt, max_new_tokens=8)
    out_c = generate_cached(model, params, prompt, max_new_tokens=8,
                            rng=jax.random.PRNGKey(3), temperature=3.0,
                            top_p=1e-9)
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(ref_c))


def test_top_p_sampling_stays_in_nucleus():
    """With top_p=0.7 every sampled token must lie in the smallest set of
    tokens covering 70% probability mass at its step (checked by replaying
    the model over the sampled prefix)."""
    from mop_tpu.models.generate import _top_p_mask

    model, params, prompt = _setup()
    out = generate(model, params, prompt, max_new_tokens=6,
                   rng=jax.random.PRNGKey(5), temperature=1.0, top_p=0.7)
    seq = np.asarray(out)
    t0 = prompt.shape[1]
    for step in range(6):
        ctx = jnp.asarray(seq[:, :t0 + step])
        window = jnp.zeros((2, 16), jnp.int32).at[:, :ctx.shape[1]].set(ctx)
        logits, _ = model.apply(params, window, train=False)
        last = logits[:, ctx.shape[1] - 1]
        allowed = np.asarray(_top_p_mask(last, 0.7)) > -np.inf
        for b in range(2):
            tok = seq[b, t0 + step]
            assert allowed[b, tok], (
                f"step {step} row {b}: token {tok} outside the 0.7 nucleus")
