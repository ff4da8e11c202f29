"""Utilities: profiling, NaN guards, torch porting, jitted init."""

from .init import jitted_init
from .metrics import cer, lm_nll, lm_perplexity, topk_accuracy, wer

__all__ = ["jitted_init", "lm_nll", "lm_perplexity", "wer", "cer",
           "topk_accuracy"]
