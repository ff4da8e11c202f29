"""Utilities: profiling, NaN guards, torch porting, jitted init."""

from .hlo_inspect import (collective_bytes, collective_count,
                          collective_summary)
from .init import jitted_init
from .metrics import cer, lm_nll, lm_perplexity, topk_accuracy, wer

__all__ = ["jitted_init", "collective_summary", "collective_bytes",
           "collective_count", "lm_nll", "lm_perplexity", "wer", "cer",
           "topk_accuracy"]
