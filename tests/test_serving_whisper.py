"""Whisper transcription serving: continuous batching == single-stream.

The Whisper decoder KV cache is exact (standard causal decoder), so the
batched per-row engine must emit EXACTLY the tokens
``whisper_transcribe_cached`` emits for each mel alone — including requests
admitted mid-flight into slots at different decode positions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mop_tpu.models import WhisperConfig, create_whisper_mop
from mop_tpu.models.generate import whisper_transcribe_cached
from mop_tpu.serving import WhisperServingEngine

BOS = 1


def _setup(n_text_ctx=16):
    wc = WhisperConfig(n_mels=8, n_audio_ctx=16, vocab_size=40,
                       n_text_ctx=n_text_ctx, n_embd=32, n_head=2,
                       n_layer_enc=1, n_layer_dec=1, dropout=0.0)
    model = create_whisper_mop(wc)
    mel0 = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 8))
    params = model.init(jax.random.PRNGKey(3), mel0,
                        jnp.zeros((1, 4), jnp.int32))
    return model, params


def _mels(n, seed=0):
    rs = np.random.RandomState(seed)
    return [rs.randn(1, 16, 8).astype(np.float32) for _ in range(n)]


def _ref(model, params, mel, n):
    out = whisper_transcribe_cached(model, params, jnp.asarray(mel),
                                    bos_token=BOS, max_tokens=n)
    return np.asarray(out)[0].tolist()


def test_single_request_matches_single_stream():
    model, params = _setup()
    (mel,) = _mels(1)
    eng = WhisperServingEngine(model, params, max_batch=2, bos_token=BOS)
    rid = eng.submit(mel, max_new_tokens=10)
    res = eng.run()
    assert eng.is_done(rid)
    assert res[rid] == _ref(model, params, mel, 10)


def test_staggered_admission_matches_single_stream():
    """Four mels, two admitted mid-flight, different budgets — every stream
    equals its solo cached transcription exactly."""
    model, params = _setup()
    mels = _mels(4)
    budgets = [12, 7, 9, 5]
    eng = WhisperServingEngine(model, params, max_batch=2, bos_token=BOS)
    r0 = eng.submit(mels[0], budgets[0])
    r1 = eng.submit(mels[1], budgets[1])
    eng.step()
    eng.step()
    r2 = eng.submit(mels[2], budgets[2])  # queued until a slot frees
    r3 = eng.submit(mels[3], budgets[3])
    res = eng.run()
    for rid, i in ((r0, 0), (r1, 1), (r2, 2), (r3, 3)):
        assert res[rid] == _ref(model, params, mels[i], budgets[i]), i
        assert len(res[rid]) == budgets[i]


def test_eos_retires_early():
    model, params = _setup()
    (mel,) = _mels(1)
    full = _ref(model, params, mel, 12)
    # eos = the first emitted token -> retire after exactly one emission
    eng = WhisperServingEngine(model, params, max_batch=1, bos_token=BOS,
                               eos_id=full[0])
    rid = eng.submit(mel, max_new_tokens=12)
    res = eng.run()
    assert res[rid] == full[:1]
    # eos never emitted -> the full budget comes out
    never = next(t for t in range(40) if t not in full)
    eng2 = WhisperServingEngine(model, params, max_batch=1, bos_token=BOS)
    rid2 = eng2.submit(mel, max_new_tokens=12, eos_id=never)
    assert eng2.run()[rid2] == full


def test_window_truncation():
    model, params = _setup(n_text_ctx=6)
    (mel,) = _mels(1)
    eng = WhisperServingEngine(model, params, max_batch=1, bos_token=BOS)
    rid = eng.submit(mel, max_new_tokens=6)
    res = eng.run()
    assert len(res[rid]) == 6  # window-capped


def test_slot_reuse_after_retirement():
    model, params = _setup()
    mels = _mels(5, seed=3)
    eng = WhisperServingEngine(model, params, max_batch=2, bos_token=BOS)
    rids = [eng.submit(m, 6) for m in mels]
    res = eng.run()
    for rid, m in zip(rids, mels):
        assert res[rid] == _ref(model, params, m, 6)


def test_submit_validation():
    model, params = _setup()
    eng = WhisperServingEngine(model, params, max_batch=1)
    with pytest.raises(ValueError, match="mel must be"):
        eng.submit(np.zeros((1, 8, 8), np.float32), 4)
    with pytest.raises(ValueError, match="max_new_tokens"):
        eng.submit(np.zeros((1, 16, 8), np.float32), 0)
