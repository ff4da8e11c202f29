"""Data loading: CIFAR pickles + synthetic fallback, batch iterators,
text tokenizers."""

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
]
