"""HTTP serving front-end: concurrent clients batch onto one engine.

Contract: tokens returned over HTTP equal what the engine returns when
driven directly, including when several clients hit the server at once
(their requests share the slot pool via continuous batching).
"""

import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from mop_tpu.models import TransformerConfig, create_gpt_quartet
from mop_tpu.serving import DecodeEngine, ServingServer

VOCAB = 50


def _engine(max_batch=3):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=64)
    model = create_gpt_quartet(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    return model, params, DecodeEngine(model, params, max_batch=max_batch)


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


@pytest.fixture()
def server():
    model, params, eng = _engine()
    srv = ServingServer(eng)
    srv.start()
    yield model, params, srv
    srv.stop()


def test_http_generate_matches_direct_engine(server):
    model, params, srv = server
    prompt, max_new = [3, 1, 4, 1, 5], 10
    direct = DecodeEngine(model, params, max_batch=3)
    rid = direct.submit(prompt, max_new)
    expected = direct.run()[rid]

    out = _post(srv.port, {"prompt": prompt, "max_new_tokens": max_new})
    assert out["tokens"] == expected

    # health endpoint reflects completion
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/health", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["completed"] >= 1


def test_http_concurrent_clients_batch_correctly(server):
    model, params, srv = server
    jobs = [([3, 1, 4, 1, 5], 12), ([2, 7], 8), ([11, 9, 8], 10),
            ([1, 2, 3, 4], 6)]
    direct = DecodeEngine(model, params, max_batch=3)
    rids = [direct.submit(*j) for j in jobs]
    res = direct.run()
    expected = [res[r] for r in rids]

    results = [None] * len(jobs)

    def client(i):
        p, n = jobs[i]
        results[i] = _post(srv.port,
                           {"prompt": p, "max_new_tokens": n})["tokens"]

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(jobs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert results == expected


def test_http_streaming_matches_blocking(server):
    """SSE events carry exactly the tokens the blocking path returns, one
    event per token plus a final done event."""
    model, params, srv = server
    prompt, max_new = [5, 9, 2, 6], 12
    blocking = _post(srv.port, {"prompt": prompt, "max_new_tokens": max_new})

    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/generate",
        data=json.dumps({"prompt": prompt, "max_new_tokens": max_new,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "text/event-stream"
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                events.append(json.loads(line[len("data: "):]))
    assert events[-1].get("done") is True
    streamed = [e["token"] for e in events[:-1]]
    assert streamed == blocking["tokens"] == events[-1]["tokens"]


def test_http_concurrent_stream_and_blocking(server):
    """A streaming client and blocking clients share the slot pool."""
    model, params, srv = server
    jobs = [([3, 1, 4], 8), ([2, 7, 1], 8), ([9, 9], 6)]
    direct = DecodeEngine(model, params, max_batch=3)
    rids = [direct.submit(*j) for j in jobs]
    res = direct.run()
    expected = [res[r] for r in rids]

    results = [None] * len(jobs)

    def stream_client(i):
        p, n = jobs[i]
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/generate",
            data=json.dumps({"prompt": p, "max_new_tokens": n,
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        toks = []
        with urllib.request.urlopen(req, timeout=120) as r:
            for raw in r:
                line = raw.decode().strip()
                if line.startswith("data: "):
                    ev = json.loads(line[len("data: "):])
                    if not ev.get("done"):
                        toks.append(ev["token"])
        results[i] = toks

    def block_client(i):
        p, n = jobs[i]
        results[i] = _post(srv.port,
                           {"prompt": p, "max_new_tokens": n})["tokens"]

    threads = [threading.Thread(target=stream_client if i == 0
                                else block_client, args=(i,))
               for i in range(len(jobs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert results == expected


def test_http_rejects_bad_requests(server):
    _, _, srv = server
    for payload in ({"prompt": "abc"}, {"max_new_tokens": 4},
                    {"prompt": [1, 2], "max_new_tokens": 0}):
        try:
            _post(srv.port, payload)
            assert False, f"expected 400 for {payload}"
        except urllib.error.HTTPError as e:
            assert e.code == 400
