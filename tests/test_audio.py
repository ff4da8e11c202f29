"""WAV parsing + log-mel frontend (mop_tpu/data/audio.py).

The reference has no audio ingestion at all — its Whisper family takes
pre-made mel tensors (mop/models/whisper_mop.py:400) and its tests
synthesize them (tests/test_whisper_mop.py:141-148). These tests pin
the file -> features contract the audio serving endpoint relies on."""

import io
import wave

import numpy as np
import pytest

from mop_tpu.data import (
    load_wav,
    log_mel,
    mel_filterbank,
    resample,
    wav_bytes,
)


def _tone(freq, sr=16000, secs=0.5, amp=0.5):
    t = np.arange(int(sr * secs)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_wav_roundtrip_16bit():
    x = _tone(440)
    y, sr = load_wav(wav_bytes(x, 16000))
    assert sr == 16000 and y.dtype == np.float32
    assert y.shape == x.shape
    assert np.max(np.abs(y - x)) < 2.0 / 32768  # 16-bit quantization


def test_wav_widths_and_stereo(tmp_path):
    x = _tone(440, secs=0.1)
    # 8-bit unsigned
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1), w.setsampwidth(1), w.setframerate(16000)
        w.writeframes(((np.clip(x, -1, 1) * 127 + 128)
                       .astype(np.uint8)).tobytes())
    y8, _ = load_wav(buf.getvalue())
    assert np.max(np.abs(y8 - x)) < 2.0 / 127
    # 32-bit int
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1), w.setsampwidth(4), w.setframerate(16000)
        w.writeframes((x * 2147483647).astype("<i4").tobytes())
    y32, _ = load_wav(buf.getvalue())
    assert np.max(np.abs(y32 - x)) < 1e-6
    # stereo mixdown: L = x, R = -x averages to ~0
    inter = np.empty(2 * len(x), np.float32)
    inter[0::2], inter[1::2] = x, -x
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2), w.setsampwidth(2), w.setframerate(16000)
        w.writeframes((inter * 32767).astype("<i2").tobytes())
    ym, _ = load_wav(buf.getvalue())
    assert ym.shape == x.shape and np.max(np.abs(ym)) < 1e-3
    # a path (not just bytes) works
    p = tmp_path / "t.wav"
    p.write_bytes(wav_bytes(x, 16000))
    yp, _ = load_wav(str(p))
    assert yp.shape == x.shape


def test_resample_length_and_tone():
    x = _tone(440, sr=8000, secs=0.25)
    y = resample(x, 8000, 16000)
    assert abs(len(y) - 2 * len(x)) <= 1
    assert resample(x, 8000, 8000) is not None  # no-op path
    # downsample keeps the tone's period: zero crossings scale
    z = resample(_tone(440, sr=48000), 48000, 16000)
    zc = np.sum(np.diff(np.signbit(z)))
    zc_ref = np.sum(np.diff(np.signbit(_tone(440, sr=16000))))
    assert abs(int(zc) - int(zc_ref)) <= 2


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(80, 400, 16000)
    assert fb.shape == (80, 201) and fb.dtype == np.float32
    assert np.all(fb >= 0)
    # every filter has mass, rows are ~area-normalized
    assert np.all(fb.sum(axis=1) > 0.5)
    # center frequencies ascend: argmax bin is non-decreasing
    assert np.all(np.diff(np.argmax(fb, axis=1)) >= 0)


def test_log_mel_shape_normalization_and_tones():
    sr, n_frames = 16000, 100
    m = log_mel(_tone(440, secs=1.0), sr, n_frames=n_frames)
    assert m.shape == (n_frames, 80) and m.dtype == np.float32
    assert np.isfinite(m).all()
    # Whisper normalization bounds: (log10 clamped to max-8 + 4) / 4
    assert m.max() <= (np.log10(1e10) + 4) / 4  # loose sanity
    assert m.max() - m.min() <= 2.0 + 1e-6      # 8 dB decades / 4
    # a high tone peaks in a higher mel channel than a low tone
    lo = log_mel(_tone(300, secs=1.0), sr, n_frames=n_frames)
    hi = log_mel(_tone(4000, secs=1.0), sr, n_frames=n_frames)
    assert np.argmax(hi.mean(axis=0)) > np.argmax(lo.mean(axis=0))
    # short audio zero-pads to the requested window
    short = log_mel(_tone(440, secs=0.05), sr, n_frames=n_frames)
    assert short.shape == (n_frames, 80)
    # and without n_frames the count follows the hop
    free = log_mel(_tone(440, secs=0.5), sr)
    assert abs(free.shape[0] - 8000 // 160) <= 1


def test_load_wav_rejects_unknown_width():
    # fabricate a 3-byte-width header via wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1), w.setsampwidth(3), w.setframerate(16000)
        w.writeframes(b"\x00\x00\x00" * 10)
    with pytest.raises(ValueError):
        load_wav(buf.getvalue())
