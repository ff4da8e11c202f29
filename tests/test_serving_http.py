"""HTTP serving front-end: concurrent clients batch onto one engine.

Contract: tokens returned over HTTP equal what the engine returns when
driven directly, including when several clients hit the server at once
(their requests share the slot pool via continuous batching).
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import json
import threading
import time
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
    assert "request_id" in events[0]
    streamed = [e["token"] for e in events if "token" in e]
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
                    if "token" in ev:
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


def _post_path(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _metrics(port):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    return {line.split()[0]: float(line.split()[1])
            for line in body.splitlines() if not line.startswith("#")}


@pytest.fixture()
def long_server():
    """Big context window so long-budget requests stay in flight long
    enough for a client to cancel them deterministically."""
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=512)
    model = create_gpt_quartet(VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    eng = DecodeEngine(model, params, max_batch=2)
    srv = ServingServer(eng)
    srv.start()
    yield eng, srv
    srv.stop()


def _open_stream(port, prompt, max_new):
    """Open an SSE stream; return (response, request_id)."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps({"prompt": prompt, "max_new_tokens": max_new,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    resp = urllib.request.urlopen(req, timeout=120)
    while True:
        line = resp.readline().decode().strip()
        if line.startswith("data: "):
            ev = json.loads(line[len("data: "):])
            return resp, ev["request_id"]


def test_http_cancel_mid_stream(long_server):
    eng, srv = long_server
    resp, rid = _open_stream(srv.port, [3, 1, 4], 400)
    out = _post_path(srv.port, "/cancel", {"request_id": rid})
    assert out == {"request_id": rid, "cancelled": True}
    events = []
    for raw in resp:
        line = raw.decode().strip()
        if line.startswith("data: "):
            events.append(json.loads(line[len("data: "):]))
    resp.close()
    assert events[-1].get("done") is True
    assert len(events[-1]["tokens"]) < 400  # stopped early
    assert eng.is_done(rid)
    # cancelling again (or an unknown rid) reports false, HTTP 200
    assert _post_path(srv.port, "/cancel",
                      {"request_id": rid})["cancelled"] is False
    assert _post_path(srv.port, "/cancel",
                      {"request_id": 10 ** 9})["cancelled"] is False


def test_http_client_disconnect_cancels(long_server):
    eng, srv = long_server
    resp, rid = _open_stream(srv.port, [2, 7, 1], 400)
    resp.close()  # client goes away mid-decode
    deadline = time.time() + 60
    while not eng.is_done(rid):
        assert time.time() < deadline, "disconnect never cancelled request"
        time.sleep(0.01)
    assert len(eng.results[rid]) < 400
    m = _metrics(srv.port)
    assert m["mop_requests_cancelled_total"] >= 1


def test_http_metrics_counters(server):
    model, params, srv = server
    before = _metrics(srv.port)
    out = _post(srv.port, {"prompt": [1, 2, 3], "max_new_tokens": 7})
    assert len(out["tokens"]) == 7
    m = _metrics(srv.port)
    assert m["mop_requests_completed_total"] == \
        before["mop_requests_completed_total"] + 1
    assert m["mop_tokens_generated_total"] >= \
        before["mop_tokens_generated_total"] + 7
    assert m["mop_requests_active"] == 0 and m["mop_requests_queued"] == 0
    assert m["mop_engine_steps_total"] > 0


def test_http_latency_histograms(server):
    model, params, srv = server
    before = _metrics(srv.port)
    out = _post(srv.port, {"prompt": [5, 2], "max_new_tokens": 6})
    assert len(out["tokens"]) == 6
    m = _metrics(srv.port)
    # one TTFT observation per completed request; TPOT needs >1 token
    assert m["mop_ttft_seconds_count"] == \
        before.get("mop_ttft_seconds_count", 0) + 1
    assert m["mop_tpot_seconds_count"] == \
        before.get("mop_tpot_seconds_count", 0) + 1
    assert m["mop_ttft_seconds_sum"] > before.get("mop_ttft_seconds_sum", 0)
    # +Inf bucket is cumulative over everything observed
    assert m['mop_ttft_seconds_bucket{le="+Inf"}'] == \
        m["mop_ttft_seconds_count"]
    assert m['mop_tpot_seconds_bucket{le="+Inf"}'] == \
        m["mop_tpot_seconds_count"]
    # nothing left pending once all requests completed
    assert not srv._lat_pending


def test_http_per_request_sampling(server):
    model, params, srv = server
    base = _post(srv.port, {"prompt": [3, 1, 4], "max_new_tokens": 8})
    degen = _post(srv.port, {"prompt": [3, 1, 4], "max_new_tokens": 8,
                             "temperature": 9.0, "top_k": 1})
    assert degen["tokens"] == base["tokens"]  # top_k=1 == greedy
    sampled = _post(srv.port, {"prompt": [3, 1, 4], "max_new_tokens": 8,
                               "temperature": 1.0, "top_p": 0.9})
    assert len(sampled["tokens"]) == 8
    try:
        _post(srv.port, {"prompt": [1], "max_new_tokens": 4, "top_p": 0})
        assert False, "expected 400 for top_p=0"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_http_guided_decoding(server):
    """guided_choice forces one of the given sequences + EOS;
    guided_token_set bounds the emitted alphabet and length; a constraint
    without an eos_id is a 400."""
    _, _, srv = server
    opts = [[9, 31, 7], [9, 14], [40, 41, 42]]
    out = _post(srv.port, {"prompt": [3, 1, 4], "max_new_tokens": 16,
                           "eos_id": 0, "guided_choice": opts})
    assert out["tokens"][-1] == 0 and out["tokens"][:-1] in opts
    out = _post(srv.port, {
        "prompt": [3, 1, 4], "max_new_tokens": 16, "eos_id": 0,
        "guided_token_set": {"allowed": [10, 11, 12], "min_len": 2,
                             "max_len": 4}})
    body = out["tokens"][:-1]
    assert out["tokens"][-1] == 0 and 2 <= len(body) <= 4
    assert set(body) <= {10, 11, 12}
    try:
        _post(srv.port, {"prompt": [1], "max_new_tokens": 4,
                         "guided_choice": opts})  # no eos_id anywhere
        assert False, "expected 400 for constraint without eos"
    except urllib.error.HTTPError as e:
        assert e.code == 400


# ---------------- graceful drain (preemption-aware shutdown) ----------------


def test_http_drain_finishes_inflight_and_rejects_new(long_server):
    """drain(): in-flight requests run to completion and return full
    results; requests arriving after drain starts get 503 + Retry-After;
    /health reports 'draining'."""
    eng, srv = long_server
    prompt, max_new = [3, 1, 4], 40

    results = {}

    def client():
        results["tokens"] = _post(srv.port, {
            "prompt": prompt, "max_new_tokens": max_new})["tokens"]

    t = threading.Thread(target=client)
    t.start()
    deadline = time.time() + 60
    while True:  # wait until the request is actually occupying a slot
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/health", timeout=30) as r:
            if json.loads(r.read())["active"] >= 1:
                break
        assert time.time() < deadline
        time.sleep(0.01)

    drain_ret = {}
    dt = threading.Thread(target=lambda: drain_ret.setdefault(
        "finished", srv.drain(stop_when_drained=False)))
    dt.start()
    # the drain flag is set synchronously at the top of drain()
    deadline = time.time() + 10
    while not srv._draining:
        assert time.time() < deadline
        time.sleep(0.005)

    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/health", timeout=30) as r:
        assert json.loads(r.read())["status"] == "draining"
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.port, {"prompt": [1], "max_new_tokens": 2})
    assert e.value.code == 503
    assert e.value.headers["Retry-After"] is not None

    t.join(timeout=120)
    dt.join(timeout=120)
    assert drain_ret["finished"] is True
    assert len(results["tokens"]) == max_new  # full result, not truncated


def test_http_drain_timeout_cancels_stragglers(long_server):
    eng, srv = long_server
    rid_holder = {}

    def client():
        try:
            rid_holder["out"] = _post(
                srv.port, {"prompt": [2, 7], "max_new_tokens": 400})
        except Exception as e:  # server may stop before completion
            rid_holder["err"] = e

    t = threading.Thread(target=client, daemon=True)
    t.start()
    deadline = time.time() + 60
    while True:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/health", timeout=30) as r:
            if json.loads(r.read())["active"] >= 1:
                break
        assert time.time() < deadline
        time.sleep(0.01)
    finished = srv.drain(timeout=0.0, stop_when_drained=False)
    assert finished is False  # straggler was cancelled, not awaited
    with srv._lock:
        assert eng.n_active == 0 and eng.n_queued == 0


def test_http_worker_death_fails_fast():
    """A fatal engine.step() exception (device lost, OOM) must not hang
    waiters: blocking requests get 500, streams terminate with an error
    event, /health reports 'failed', and new submissions are rejected."""
    _, _, eng = _engine()
    srv = ServingServer(eng)

    def boom():
        raise RuntimeError("simulated device loss")

    srv.engine.step = boom
    srv.start()
    try:
        # blocking request fails with 500 instead of hanging
        try:
            _post(srv.port, {"prompt": [1, 2], "max_new_tokens": 4})
            assert False, "expected 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "device worker failed" in json.loads(e.read())["error"]
        # health reflects the failure
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/health", timeout=30) as r:
            assert json.loads(r.read())["status"] == "failed"
        # new submissions are rejected up front
        try:
            _post(srv.port, {"prompt": [3], "max_new_tokens": 2})
            assert False, "expected 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        srv.stop()


def test_http_stream_fails_fast_on_worker_death():
    """An SSE stream opened before the worker dies ends with an error
    event rather than polling forever."""
    _, _, eng = _engine()
    srv = ServingServer(eng)
    real_step, state = eng.step, {"n": 0}

    def flaky():
        # let the first request finish so the stream request is accepted,
        # then die on its first decode step
        if state["n"] >= 1:
            raise RuntimeError("simulated device loss")
        state["n"] += 1
        while eng.n_queued or eng.n_active:
            real_step()

    srv.engine.step = flaky
    srv.start()
    try:
        out = _post(srv.port, {"prompt": [1, 2], "max_new_tokens": 3})
        assert len(out["tokens"]) == 3
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/generate",
            data=json.dumps({"prompt": [4, 5], "max_new_tokens": 50,
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        events = []
        with urllib.request.urlopen(req, timeout=60) as r:
            for raw in r:
                line = raw.decode().strip()
                if line.startswith("data: "):
                    events.append(json.loads(line[len("data: "):]))
        assert any("error" in ev for ev in events)
        assert not any(ev.get("done") for ev in events)
    finally:
        srv.stop()


def test_http_signal_triggers_drain():
    """install_drain_handler(): a (harmless, test-safe) signal drains and
    stops the whole server — the TPU-VM preemption path end-to-end."""
    import os
    import signal as _signal

    model, params, eng = _engine()
    direct = DecodeEngine(model, params, max_batch=3)
    rid = direct.submit([3, 1, 4, 1, 5], 8)
    expected = direct.run()[rid]

    srv = ServingServer(eng)
    srv.start()
    prev = _signal.getsignal(_signal.SIGUSR2)
    try:
        srv.install_drain_handler(signals=(_signal.SIGUSR2,))
        out = _post(srv.port, {"prompt": [3, 1, 4, 1, 5],
                               "max_new_tokens": 8})
        assert out["tokens"] == expected
        os.kill(os.getpid(), _signal.SIGUSR2)
        assert srv.wait_drained(timeout=60)
        assert not srv._running  # drain stopped the server
    finally:
        _signal.signal(_signal.SIGUSR2, prev)
        if srv._running:
            srv.stop()


def test_http_admission_backpressure_429():
    """Bounded queue: a burst of 4x capacity is either served or cleanly
    rejected with 429 + Retry-After — the queue never grows past
    max_queue and the rejection counter lands in /metrics (VERDICT r3
    #8: previously the queue was unbounded)."""
    model, params, eng = _engine(max_batch=2)
    srv = ServingServer(eng, max_queue=2, retry_after=3)
    srv.start()
    try:
        results = []
        lock = threading.Lock()

        def client(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/generate",
                data=json.dumps({"prompt": [1 + i % 5, 2, 3],
                                 "max_new_tokens": 24}).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    body = json.loads(r.read())
                    with lock:
                        results.append((200, None, body))
            except urllib.error.HTTPError as e:
                with lock:
                    results.append((e.code, e.headers.get("Retry-After"),
                                    json.loads(e.read())))

        # 4x capacity: 2 slots + 2 queue = 4 absorbable at once; 16 sent
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        codes = [c for c, _, _ in results]
        assert len(results) == 16
        assert set(codes) <= {200, 429}
        n_ok = codes.count(200)
        assert n_ok >= 1  # capacity was served
        assert 429 in codes  # the burst overflowed the bound
        for code, retry, body in results:
            if code == 429:
                assert retry == "3"
                assert "queue full" in str(body)
            else:
                assert len(body["tokens"]) == 24
        # rejections are observable; the server stays healthy after
        m = _metrics(srv.port)
        assert m["mop_requests_rejected_total"] == float(
            codes.count(429))
        ok = _post(srv.port, {"prompt": [1, 2], "max_new_tokens": 4})
        assert len(ok["tokens"]) == 4
    finally:
        srv.stop()
