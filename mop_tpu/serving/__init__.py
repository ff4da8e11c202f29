"""TPU-native serving layer: continuous-batching autoregressive decode.

The reference has no inference/serving story (its models stop at
teacher-forced logits, ``mop/models/gpt_mop.py:181-207``); this package is
part of the production surface BASELINE.json asks for beyond capability
parity.
"""

from .constrain import TokenDFA, choices, token_set
from .embeddings import (EmbeddingModel, embeddings_body,
                         parse_embedding_input)
from .json_schema import json_schema_to_dfa, json_schema_to_regex
from .regex_dfa import regex_to_dfa
from .scoring import prompt_logprobs
from .engine import (DecodeEngine, SpecDecodeEngine, decode_chunk_rows,
                     decode_step_rows, lora_params_view)
from .export import export_apply, export_fn, load_exported, save_exported
from .http import ServingServer
from .paged import (PagedDecodeEngine, init_paged_pool,
                    paged_decode_step_rows)
from .whisper import WhisperServingEngine, whisper_decode_step_rows

__all__ = ["DecodeEngine", "EmbeddingModel", "PagedDecodeEngine",
           "ServingServer", "SpecDecodeEngine", "TokenDFA",
           "WhisperServingEngine", "choices", "decode_chunk_rows",
           "decode_step_rows", "embeddings_body", "export_apply",
           "export_fn", "init_paged_pool", "json_schema_to_dfa",
           "json_schema_to_regex", "load_exported", "lora_params_view",
           "paged_decode_step_rows", "parse_embedding_input",
           "prompt_logprobs", "regex_to_dfa", "save_exported",
           "token_set", "whisper_decode_step_rows"]
