"""TPU-native serving layer: continuous-batching autoregressive decode.

The reference has no inference/serving story (its models stop at
teacher-forced logits, ``mop/models/gpt_mop.py:181-207``); this package is
part of the production surface BASELINE.json asks for beyond capability
parity.
"""

from .engine import (DecodeEngine, SpecDecodeEngine, decode_chunk_rows,
                     decode_step_rows)
from .http import ServingServer

__all__ = ["DecodeEngine", "ServingServer", "SpecDecodeEngine",
           "decode_chunk_rows", "decode_step_rows"]
