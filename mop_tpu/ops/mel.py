"""On-device log-mel spectrogram frontend (XLA-native).

The reference Whisper-MoP consumes precomputed mel features
(``mop/models/whisper_mop.py:352-376`` takes (B, T, n_mels) directly); the
BASELINE.json north star makes the log-mel frontend an on-device XLA
preprocessing stage. Whisper-style defaults: n_fft=400, hop=160, 80 mels,
log10 with dynamic-range clamping.

Everything is jittable: framing via gather, Hann window, rFFT on the MXU/VPU,
and a fixed mel filterbank matmul.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def hann_window(n: int) -> Array:
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n)


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(n_mels: int, n_fft: int, sample_rate: int,
                   fmin: float = 0.0, fmax: Optional[float] = None) -> np.ndarray:
    """(n_freqs, n_mels) triangular mel filterbank (HTK scale)."""
    fmax = fmax or sample_rate / 2
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fb = np.zeros((n_freqs, n_mels), np.float32)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


def frame_signal(audio: Array, n_fft: int, hop: int) -> Array:
    """(B, S) -> (B, T, n_fft) overlapping frames (reflect-padded)."""
    pad = n_fft // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]  # (T, n_fft)
    return x[:, idx]


def log_mel_spectrogram(
    audio: Array,
    sample_rate: int = 16_000,
    n_fft: int = 400,
    hop: int = 160,
    n_mels: int = 80,
) -> Array:
    """(B, S) raw audio in [-1,1] -> (B, T, n_mels) Whisper-style log-mel.

    log10 power through the mel filterbank, clamped to (max - 8), then
    scaled to roughly [-1, 1] via (x + 4) / 4.
    """
    frames = frame_signal(audio, n_fft, hop)  # (B, T, n_fft)
    win = hann_window(n_fft).astype(frames.dtype)
    spec = jnp.fft.rfft(frames * win, axis=-1)
    power = jnp.square(jnp.abs(spec)).astype(jnp.float32)  # (B, T, F)
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate))
    mel = power @ fb  # (B, T, n_mels)
    log_mel = jnp.log10(jnp.maximum(mel, 1e-10))
    log_mel = jnp.maximum(log_mel, jnp.max(log_mel, axis=(-2, -1), keepdims=True) - 8.0)
    return (log_mel + 4.0) / 4.0
