#!/usr/bin/env python
"""Serve the namesake model: train a character-level GPT_MoP (causal-gate
variant) and deploy it behind the OpenAI-compatible HTTP front-end.

End to end in one file: char tokenizer -> `create_gpt_mop_causal` (the
serving-exact variant: left-padded gate convs + causal-prefix score
standardization — its KV-cached decode equals the full-window sampler
token-for-token) -> short training run -> continuous-batching engine with
beam support -> /v1/completions + /v1/embeddings self-test, including a
beam-search request via the `num_beams` extension field.

The reference's GPT_MoP computes teacher-forced logits only
(`/root/reference/mop/models/gpt_mop.py:181-207`) — no decode loop exists.

Usage:
  python examples/serve_gpt_mop.py                  # train, serve, self-test
  python examples/serve_gpt_mop.py --steps 400 --keep-serving --port 8000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = (
    "the quick brown fox jumps over the lazy dog. "
    "pack my box with five dozen liquor jugs. "
    "how vexingly quick daft zebras jump. "
) * 40


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--keep-serving", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from mop_tpu.data import CharTokenizer
    from mop_tpu.models import TransformerConfig, create_gpt_mop_causal
    from mop_tpu.serving import DecodeEngine, ServingServer
    from mop_tpu.utils import jitted_init

    tok = CharTokenizer(sorted(set(CORPUS)))
    ids = np.asarray(tok.encode(CORPUS), np.int32)
    cfg = TransformerConfig(n_layer=4, n_head=4, n_embd=128, dropout=0.0,
                            block_size=128, use_quartet=False)
    model = create_gpt_mop_causal(tok.vocab_size, cfg)
    params = jitted_init(model, jax.random.PRNGKey(0),
                         jnp.zeros((1, 8), jnp.int32))
    tx = optax.adamw(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, idx, tgt):
        def lf(p):
            _, loss = model.apply(p, idx, targets=tgt, train=False)
            return loss

        loss, g = jax.value_and_grad(lf)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    rs = np.random.RandomState(0)
    t = 64
    for i in range(args.steps):
        off = rs.randint(0, len(ids) - t - 1, (32,))
        batch = np.stack([ids[o:o + t + 1] for o in off])
        params, opt, loss = step(params, opt,
                                 jnp.asarray(batch[:, :-1]),
                                 jnp.asarray(batch[:, 1:]))
        if i % 50 == 0:
            print(f"step {i}: loss {float(loss):.3f}", flush=True)

    eng = DecodeEngine(model, params, max_batch=4, max_beams=4,
                       eos_id=tok.eos_id)
    srv = ServingServer(eng, tokenizer=tok, model_name="gpt-mop-causal",
                        port=args.port)
    srv.start()
    base = f"http://127.0.0.1:{srv.port}"
    print(f"serving GPT_MoP on {base}", flush=True)

    def post(path, body):
        req = urllib.request.Request(
            base + path, json.dumps(body).encode(),
            {"Content-Type": "application/json"})
        return json.load(urllib.request.urlopen(req, timeout=300))

    out = post("/v1/completions",
               {"prompt": "the quick brown ", "max_tokens": 24})
    print("greedy:", repr(out["choices"][0]["text"]))
    out = post("/v1/completions",
               {"prompt": "pack my box ", "max_tokens": 24,
                "num_beams": 4, "length_penalty": 1.0})
    print("beam-4:", repr(out["choices"][0]["text"]))
    out = post("/v1/embeddings", {"input": ["quick fox", "lazy dog"]})
    v = np.asarray([d["embedding"] for d in out["data"]])
    print(f"embeddings: {v.shape}, cos(sim)={float(v[0] @ v[1]):.3f}")

    if args.keep_serving:
        print("serving until Ctrl-C ...", flush=True)
        try:
            import time

            while True:
                time.sleep(1)
        except KeyboardInterrupt:
            pass
    srv.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
