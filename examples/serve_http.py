#!/usr/bin/env python
"""Serving demo: train a byte-BPE tokenizer + tiny LM on a text corpus,
deploy both behind the HTTP front-end, and run concurrent TEXT clients
against it.

The full production path in one file: tokenizer training -> LM training
-> (optional int8/int4 weight quantization) -> continuous-batching
engine (optionally speculative) -> HTTP with server-side encode/decode
and UTF-8-safe streamed text. The reference has no inference or serving
story at all (SURVEY §0).

Usage:
  python examples/serve_http.py                 # train, serve, self-test
  python examples/serve_http.py --port 8000 --keep-serving
  python examples/serve_http.py --quant int4 --spec
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


CORPUS = ("the quick brown fox jumps over the lazy dog. "
          "pack my box with five dozen liquor jugs. ") * 64


def train_char_lm(n_layer, n_embd, n_head, steps, seed, vocab_size, data):
    """Quartet LM briefly trained on a pre-tokenized corpus."""
    import optax

    from mop_tpu.models import TransformerConfig, create_gpt_quartet
    from mop_tpu.utils import jitted_init

    cfg = TransformerConfig(n_layer=n_layer, n_head=n_head, n_embd=n_embd,
                            dropout=0.0, block_size=256)
    model = create_gpt_quartet(vocab_size, cfg)
    params = jitted_init(model, jax.random.PRNGKey(seed),
                         jnp.zeros((1, 64), jnp.int32))
    tx = optax.adamw(3e-4)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, idx, tgt):
        def lf(p):
            _, loss = model.apply(p, idx, targets=tgt, train=False)
            return loss
        loss, g = jax.value_and_grad(lf)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    rs = np.random.RandomState(seed)
    t = 64
    for s in range(steps):
        i0 = rs.randint(0, data.size - t - 1, size=(32,))
        batch = np.stack([data[i:i + t + 1] for i in i0])
        params, opt, loss = step(
            params, opt, jnp.asarray(batch[:, :-1], jnp.int32),
            jnp.asarray(batch[:, 1:], jnp.int32))
    return model, params, float(loss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--max_batch", type=int, default=4)
    ap.add_argument("--quant", choices=["none", "int8", "int4"],
                    default="none")
    ap.add_argument("--spec", action="store_true",
                    help="serve with speculative decoding (2-layer draft)")
    ap.add_argument("--prefix_cache", type=int, default=4,
                    help="prefix-cache LRU entries (0 disables)")
    ap.add_argument("--keep-serving", action="store_true",
                    help="stay up after the self-test (Ctrl-C to stop)")
    args = ap.parse_args()

    from mop_tpu.data import ByteBPETokenizer
    from mop_tpu.serving import DecodeEngine, ServingServer, SpecDecodeEngine

    print("training byte-BPE tokenizer...", flush=True)
    tok = ByteBPETokenizer.train(CORPUS, vocab_size=320)
    data = np.asarray(tok.encode(CORPUS), np.int64)
    print(f"vocab {tok.vocab_size}, corpus {len(CORPUS)} chars -> "
          f"{data.size} tokens", flush=True)

    print(f"training target LM ({args.steps} steps)...", flush=True)
    model, params, loss = train_char_lm(4, 128, 4, args.steps, seed=0,
                                        vocab_size=tok.vocab_size, data=data)
    print(f"target loss {loss:.3f}", flush=True)

    if args.quant != "none":
        from mop_tpu.ops.quant import quantize_params, quantized_bytes
        bits = 8 if args.quant == "int8" else 4
        params = quantize_params(params, bits=bits)
        stored, fp32 = quantized_bytes(params)
        print(f"{args.quant} weights: {stored / 1e6:.2f} MB stored "
              f"(fp32 would be {fp32 / 1e6:.2f} MB)", flush=True)

    if args.spec:
        draft, dparams, dloss = train_char_lm(
            2, 64, 2, args.steps, seed=1, vocab_size=tok.vocab_size,
            data=data)
        print(f"draft loss {dloss:.3f}", flush=True)
        eng = SpecDecodeEngine(model, params, draft, dparams,
                               max_batch=args.max_batch, gamma=4,
                               prefix_cache_entries=args.prefix_cache)
    else:
        eng = DecodeEngine(model, params, max_batch=args.max_batch,
                           prefix_cache_entries=args.prefix_cache)

    srv = ServingServer(eng, port=args.port, tokenizer=tok)
    srv.start()
    print(f"serving on http://127.0.0.1:{srv.port}  "
          f"(POST /generate with 'text' or 'prompt', GET /health)",
          flush=True)

    # self-test: three concurrent TEXT clients (server-side encode/decode)
    prompts = ["the quick ", "pack my ", "five dozen "]
    outs = [None] * len(prompts)

    def client(i):
        body = {"text": prompts[i], "max_new_tokens": 24}
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/generate",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            outs[i] = json.loads(r.read())["text"]

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for p, text in zip(prompts, outs):
        print(f"  {p!r} -> {text!r}", flush=True)

    # streaming client: text pieces arrive as SSE events while decoding runs
    body = {"text": "the quick ", "max_new_tokens": 24, "stream": True}
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/generate",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    pieces = []
    with urllib.request.urlopen(req, timeout=300) as r:
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                ev = json.loads(line[len("data: "):])
                if "token" in ev:
                    pieces.append(ev["text"])
    print(f"  streamed: 'the quick ' -> {''.join(pieces)!r}", flush=True)

    # OpenAI-compatible client: same slot pool, OpenAI wire shapes
    body = {"model": "mop", "prompt": "the quick ", "max_tokens": 16,
            "stop": ["."]}
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/v1/completions",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        choice = json.loads(r.read())["choices"][0]
    print(f"  /v1/completions: {choice['text']!r} "
          f"(finish={choice['finish_reason']})", flush=True)

    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/metrics", timeout=30) as r:
        metrics = r.read().decode()
    counters = dict(line.split() for line in metrics.splitlines()
                    if not line.startswith("#"))
    print(f"  /metrics: {counters['mop_requests_completed_total']} "
          f"requests, {counters['mop_tokens_generated_total']} tokens, "
          f"{counters['mop_engine_steps_total']} engine steps", flush=True)

    if args.keep_serving:
        # SIGTERM (TPU-VM preemption / orchestrator stop) drains
        # gracefully: stop admitting, finish in-flight streams, exit.
        srv.install_drain_handler(timeout=30.0)
        print("serving until Ctrl-C (SIGTERM drains gracefully)...",
              flush=True)
        try:
            srv.wait_drained()
        except KeyboardInterrupt:
            pass
    if srv._running:
        srv.stop()


if __name__ == "__main__":
    main()
