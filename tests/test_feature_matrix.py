"""Feature-interaction matrix: the EXPLICIT-ERROR cells.

docs/SERVING.md publishes the decode feature-interaction matrix
(VERDICT r4 item 5): every combination is either tested working or a
tested explicit error. The working cells are pinned in their own
suites; this file pins the guard cells so no unsupported pairing can
silently latch a mid-decode failure:

* int8-KV on the continuous-batching engines -> ValueError at
  construction (dense/paged/spec all ride the same base check).
* ``ServingServer(steps_per_dispatch > 1)`` with an engine whose step()
  takes no ``n_tokens`` (SpecDecodeEngine) -> ValueError at
  construction, not a latched TypeError at the first request
  (ADVICE r4).
* ``num_beams`` submitted to an engine without beam support -> clean
  ValueError (paged: ``max_beams`` is not constructible) or a clean
  HTTP 400 (spec engine via the OpenAI layer, whose submit lacks the
  kwarg entirely — the TypeError is caught, ADVICE r4).
"""

# Slow lane: excluded from the default `pytest` run (see tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_quartet
from mop_tpu.serving import DecodeEngine, ServingServer, SpecDecodeEngine
from mop_tpu.serving.paged import PagedDecodeEngine

VOCAB = 50


def _mk(n_layer=2, n_embd=32, seed=1):
    cfg = TransformerConfig(n_layer=n_layer, n_head=2, n_embd=n_embd,
                            dropout=0.0, block_size=64)
    model = create_gpt_quartet(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 8), jnp.int32))
    return model, params


def test_int8_kv_rejected_by_all_engines():
    model, params = _mk()
    draft_m, draft_p = _mk(n_layer=1, n_embd=16, seed=9)
    with pytest.raises(ValueError, match="int8 per-row-scale"):
        DecodeEngine(model, params, kv_dtype=jnp.int8)
    with pytest.raises(ValueError, match="int8 per-row-scale"):
        PagedDecodeEngine(model, params, n_pages=8, page_size=16,
                          kv_dtype=jnp.int8)
    with pytest.raises(ValueError, match="int8 per-row-scale"):
        SpecDecodeEngine(model, params, draft_m, draft_p,
                         kv_dtype=jnp.int8)


def test_steps_per_dispatch_validated_at_construction():
    model, params = _mk()
    draft_m, draft_p = _mk(n_layer=1, n_embd=16, seed=9)
    spec = SpecDecodeEngine(model, params, draft_m, draft_p, max_batch=2)
    with pytest.raises(ValueError, match="n_tokens"):
        ServingServer(spec, steps_per_dispatch=4)
    with pytest.raises(ValueError, match=">= 1"):
        ServingServer(DecodeEngine(model, params, max_batch=2),
                      steps_per_dispatch=0)
    # dense and paged engines DO take n_tokens — constructible
    ServingServer(DecodeEngine(model, params, max_batch=2),
                  steps_per_dispatch=4)
    ServingServer(PagedDecodeEngine(model, params, max_batch=2,
                                    n_pages=8, page_size=16),
                  steps_per_dispatch=4)


def test_num_beams_on_beamless_engines_is_a_clean_error():
    model, params = _mk()
    # paged engine: max_beams is not a constructor parameter, so beam
    # support is structurally off -> submit-time ValueError
    paged = PagedDecodeEngine(model, params, max_batch=2, n_pages=8,
                              page_size=16)
    with pytest.raises(ValueError):
        paged.submit([1, 2, 3], max_new_tokens=4, num_beams=2)


def test_num_beams_over_http_returns_400_not_dropped_connection():
    """ADVICE r4: SpecDecodeEngine.submit has no num_beams kwarg; the
    OpenAI layer's forwarding used to raise TypeError past the handler
    and abort the connection. Now: clean 400 with the error message."""

    class _IdTok:
        def encode(self, s):
            return [ord(c) % VOCAB for c in s]

        def decode(self, ids):
            return "".join(chr(32 + (i % 90)) for i in ids)

    model, params = _mk()
    draft_m, draft_p = _mk(n_layer=1, n_embd=16, seed=9)
    spec = SpecDecodeEngine(model, params, draft_m, draft_p, max_batch=2)
    srv = ServingServer(spec, tokenizer=_IdTok(), model_name="mop-spec")
    srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=json.dumps({"model": "mop-spec", "prompt": "ab",
                             "max_tokens": 4, "num_beams": 2}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400
        body = json.loads(ei.value.read())
        assert "error" in body
        # the server is still healthy afterwards (no latched step error)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/health", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        srv.stop()
