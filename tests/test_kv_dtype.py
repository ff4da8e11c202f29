"""bf16 KV-cache storage: dtype plumbing + bounded perturbation.

Compute stays fp32 everywhere; only the stored K/K2/V rows are bf16, so
prefill logits (computed from fp32 activations before any cache read) must
be BIT-EQUAL, and decode logits may differ only by the bf16 rounding of the
cached rows. Throughput/agreement at serving scale: benchmarks/decode.md.
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from mop_tpu.models import TransformerConfig, create_gpt_quartet, \
    generate_cached
from mop_tpu.models.generate import decode_step, prefill
from mop_tpu.serving import DecodeEngine, PagedDecodeEngine


def _setup(block=32, vocab=50):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=block)
    model = create_gpt_quartet(vocab, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params


def test_prefill_bf16_cache_dtype_and_exact_logits():
    model, params = _setup()
    prompt = jnp.asarray([[5, 17, 3, 41, 2, 9]], jnp.int32)
    lo32, c32 = prefill(model, params, prompt)
    lo16, c16 = prefill(model, params, prompt, kv_dtype=jnp.bfloat16)
    assert c16["k"].dtype == c16["k2"].dtype == c16["v"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(lo32), np.asarray(lo16))
    # stored rows are exactly the bf16 rounding of the fp32 rows
    np.testing.assert_array_equal(
        np.asarray(c16["k"]),
        np.asarray(c32["k"].astype(jnp.bfloat16)))


def test_decode_step_bf16_perturbation_bounded():
    model, params = _setup()
    prompt = jnp.asarray([[5, 17, 3, 41, 2, 9]], jnp.int32)
    _, c32 = prefill(model, params, prompt)
    _, c16 = prefill(model, params, prompt, kv_dtype=jnp.bfloat16)
    tok = jnp.asarray([7], jnp.int32)
    lo32, _ = decode_step(model, params, c32, tok)
    lo16, _ = decode_step(model, params, c16, tok)
    diff = float(jnp.max(jnp.abs(lo32 - lo16)))
    spread = float(jnp.max(lo32) - jnp.min(lo32))
    assert diff < 0.05 * max(spread, 1.0), (diff, spread)


def test_generate_cached_bf16_runs():
    model, params = _setup()
    prompt = jnp.asarray([[5, 17, 3, 41]], jnp.int32)
    out = generate_cached(model, params, prompt, max_new_tokens=8,
                          kv_dtype=jnp.bfloat16)
    assert out.shape == (1, 12)
    assert out.dtype == jnp.int32


def test_prefill_int8_cache_layout_and_exact_logits():
    model, params = _setup()
    prompt = jnp.asarray([[5, 17, 3, 41, 2, 9]], jnp.int32)
    lo32, c32 = prefill(model, params, prompt)
    lo8, c8 = prefill(model, params, prompt, kv_dtype=jnp.int8)
    assert c8["k"].dtype == jnp.int8 and c8["v"].dtype == jnp.int8
    assert c8["k_s"].dtype == jnp.float32
    assert c8["k_s"].shape == c8["k"].shape[:4]
    np.testing.assert_array_equal(np.asarray(lo32), np.asarray(lo8))
    # dequantized rows reconstruct the fp32 rows to within one quant step
    recon = np.asarray(c8["k"], np.float32) * np.asarray(c8["k_s"])[..., None]
    ref = np.asarray(c32["k"])
    step = np.asarray(c8["k_s"])[..., None]
    assert np.all(np.abs(recon - ref) <= 0.5 * step + 1e-6)


def test_decode_step_int8_perturbation_bounded():
    model, params = _setup()
    prompt = jnp.asarray([[5, 17, 3, 41, 2, 9]], jnp.int32)
    _, c32 = prefill(model, params, prompt)
    _, c8 = prefill(model, params, prompt, kv_dtype=jnp.int8)
    tok = jnp.asarray([7], jnp.int32)
    lo32, nc32 = decode_step(model, params, c32, tok)
    lo8, nc8 = decode_step(model, params, c8, tok)
    assert nc8["k"].dtype == jnp.int8  # appended row stays quantized
    diff = float(jnp.max(jnp.abs(lo32 - lo8)))
    spread = float(jnp.max(lo32) - jnp.min(lo32))
    assert diff < 0.15 * max(spread, 1.0), (diff, spread)


def test_generate_cached_int8_runs_and_grow_matches():
    model, params = _setup(block=256)
    prompt = jnp.asarray([[5, 17, 3, 41]], jnp.int32)
    base = generate_cached(model, params, prompt, max_new_tokens=150,
                           kv_dtype=jnp.int8)
    assert base.shape == (1, 154)
    grow = generate_cached(model, params, prompt, max_new_tokens=150,
                           kv_dtype=jnp.int8, grow_window=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(grow))


def test_whisper_cached_bf16_runs():
    from mop_tpu.models import WhisperConfig, create_whisper_mop
    from mop_tpu.models.generate import whisper_transcribe_cached

    wc = WhisperConfig(n_mels=8, n_audio_ctx=16, vocab_size=40,
                       n_text_ctx=16, n_embd=32, n_head=2, n_layer_enc=1,
                       n_layer_dec=1, dropout=0.0)
    wm = create_whisper_mop(wc)
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 8))
    wp = wm.init(jax.random.PRNGKey(3), mel, jnp.zeros((2, 4), jnp.int32))
    out = whisper_transcribe_cached(wm, wp, mel, bos_token=1, max_tokens=6,
                                    kv_dtype=jnp.bfloat16)
    assert out.shape == (2, 6) and out.dtype == jnp.int32


def test_whisper_cached_int8_close_to_fp32():
    """Round 5: int8 KV (per-row scales, self + cross attention) for the
    Whisper cached decoder — a mild perturbation of the fp32 path, not
    the garbage a raw int8 cast would produce (the quality rung is
    measured in benchmarks/quality_ladder.md)."""
    from mop_tpu.models import WhisperConfig, create_whisper_mop
    from mop_tpu.models.generate import whisper_transcribe_cached

    wc = WhisperConfig(n_mels=8, n_audio_ctx=16, vocab_size=40,
                       n_text_ctx=16, n_embd=32, n_head=2, n_layer_enc=1,
                       n_layer_dec=1, dropout=0.0)
    wm = create_whisper_mop(wc)
    mel = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 8))
    wp = wm.init(jax.random.PRNGKey(3), mel, jnp.zeros((4, 4), jnp.int32))
    ref = whisper_transcribe_cached(wm, wp, mel, bos_token=1, max_tokens=8)
    got = whisper_transcribe_cached(wm, wp, mel, bos_token=1, max_tokens=8,
                                    kv_dtype=jnp.int8)
    assert got.shape == ref.shape and got.dtype == jnp.int32
    agree = float(np.mean(np.asarray(got) == np.asarray(ref)))
    assert agree >= 0.5, f"int8 whisper KV diverged wildly: {agree}"


def test_whisper_transcribe_auto_dispatch():
    """The shape-aware full-window-vs-cached dispatch returns identical
    tokens on both sides of the crossover (the cached path is exact for
    Whisper)."""
    from mop_tpu import config as mcfg
    from mop_tpu.models import WhisperConfig, create_whisper_mop
    from mop_tpu.models.generate import whisper_transcribe, \
        whisper_transcribe_auto, whisper_transcribe_cached

    wc = WhisperConfig(n_mels=8, n_audio_ctx=16, vocab_size=40,
                       n_text_ctx=32, n_embd=32, n_head=2, n_layer_enc=1,
                       n_layer_dec=1, dropout=0.0)
    wm = create_whisper_mop(wc)
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 8))
    wp = wm.init(jax.random.PRNGKey(3), mel, jnp.zeros((2, 4), jnp.int32))
    old = mcfg.config.whisper_cached_min_ctx
    try:
        mcfg.config.whisper_cached_min_ctx = 10
        below = whisper_transcribe_auto(wm, wp, mel, 1, 6)   # full window
        above = whisper_transcribe_auto(wm, wp, mel, 1, 12)  # cached
    finally:
        mcfg.config.whisper_cached_min_ctx = old
    np.testing.assert_array_equal(
        np.asarray(below),
        np.asarray(whisper_transcribe(wm, wp, mel, 1, 6)))
    np.testing.assert_array_equal(
        np.asarray(above),
        np.asarray(whisper_transcribe_cached(wm, wp, mel, 1, 12)))


def test_engines_bf16_kv():
    model, params = _setup()
    jobs = [([5, 17, 3], 6), ([1, 2, 3, 4, 5], 6)]
    for eng in (DecodeEngine(model, params, max_batch=2,
                             kv_dtype=jnp.bfloat16),
                PagedDecodeEngine(model, params, max_batch=2, n_pages=8,
                                  page_size=8, kv_dtype=jnp.bfloat16)):
        rids = [eng.submit(p, n) for p, n in jobs]
        res = eng.run()
        assert all(len(res[r]) == 6 for r in rids)
    assert eng._pool["k"].dtype == jnp.bfloat16
