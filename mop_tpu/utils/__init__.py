"""Utilities: profiling, NaN guards, torch porting, jitted init."""

from .init import jitted_init

__all__ = ["jitted_init"]
