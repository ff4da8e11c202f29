"""Data loading: CIFAR pickles + synthetic fallback, batch iterators,
text tokenizers, WAV + log-mel audio frontend."""

from .audio import (load_wav, log_mel, mel_filterbank, resample,
                    segment_frames, wav_bytes)
from .tokenizer import ByteBPETokenizer, CharTokenizer
from .cifar import (
    BatchIterator,
    eval_batches,
    has_real_data,
    load_cifar,
    synthetic_cifar,
    train_val_split,
)

__all__ = [
    "load_cifar",
    "synthetic_cifar",
    "has_real_data",
    "train_val_split",
    "BatchIterator",
    "eval_batches",
    "ByteBPETokenizer",
    "CharTokenizer",
    "load_wav",
    "wav_bytes",
    "resample",
    "mel_filterbank",
    "log_mel",
    "segment_frames",
]
