"""OpenAI-compatible /v1/audio/transcriptions: WAV upload -> log-mel ->
the Whisper continuous-batching engine -> text.

The reference has neither serving nor audio ingestion (SURVEY §0); this
pins the full file -> features -> engine -> response path plus the
multipart field contract (reject-don't-ignore, like the text routes)."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mop_tpu.data import CharTokenizer, wav_bytes
from mop_tpu.models import (
    TransformerConfig,
    WhisperConfig,
    create_gpt_quartet,
    create_whisper_mop,
)
from mop_tpu.serving import DecodeEngine, ServingServer, WhisperServingEngine
from mop_tpu.serving.openai_api import parse_transcription

BOUNDARY = "mopboundary31337"


def _multipart(fields, file_bytes=None, filename="audio.wav"):
    out = b""
    for k, v in fields.items():
        out += (f"--{BOUNDARY}\r\nContent-Disposition: form-data; "
                f'name="{k}"\r\n\r\n{v}\r\n').encode()
    if file_bytes is not None:
        out += (f"--{BOUNDARY}\r\nContent-Disposition: form-data; "
                f'name="file"; filename="{filename}"\r\n'
                "Content-Type: audio/wav\r\n\r\n").encode()
        out += file_bytes + b"\r\n"
    out += f"--{BOUNDARY}--\r\n".encode()
    return out, f"multipart/form-data; boundary={BOUNDARY}"


def _tone(freq=440.0, secs=0.2, sr=16000):
    t = np.arange(int(sr * secs)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_parse_transcription_unit():
    wav = wav_bytes(_tone(), 16000)
    body, ctype = _multipart({"model": "mop-whisper",
                              "response_format": "text",
                              "temperature": "0"}, wav)
    plan = parse_transcription(ctype, body)
    assert plan["file"] == wav and plan["response_format"] == "text"
    # defaults
    body, ctype = _multipart({}, wav)
    assert parse_transcription(ctype, body)["response_format"] == "json"
    for bad_fields in ({"language": "en"},
                       {"prompt": "hello"},
                       {"timestamp_granularities": "word"},
                       {"response_format": "srt"},
                       {"temperature": "0.7"},
                       {"mystery": "1"}):
        body, ctype = _multipart(bad_fields, wav)
        with pytest.raises(ValueError):
            parse_transcription(ctype, body)
    # missing file part
    body, ctype = _multipart({"model": "m"})
    with pytest.raises(ValueError):
        parse_transcription(ctype, body)
    # not multipart at all
    with pytest.raises(ValueError):
        parse_transcription("application/json", b"{}")


@pytest.fixture(scope="module")
def audio_server():
    tok = CharTokenizer(
        "abcdefghijklmnopqrstuvwxyz 0123456789.,!?-:;'\"")
    wc = WhisperConfig(n_mels=8, n_audio_ctx=16, vocab_size=tok.vocab_size,
                       n_text_ctx=16, n_embd=32, n_head=2,
                       n_layer_enc=1, n_layer_dec=1, dropout=0.0)
    wmodel = create_whisper_mop(wc)
    wparams = wmodel.init(jax.random.PRNGKey(3),
                          jnp.zeros((1, 16, 8)),
                          jnp.zeros((1, 4), jnp.int32))
    weng = WhisperServingEngine(wmodel, wparams, max_batch=2, bos_token=1)

    cfg = TransformerConfig(n_layer=1, n_head=2, n_embd=32, dropout=0.0,
                            block_size=32)
    gmodel = create_gpt_quartet(tok.vocab_size, cfg)
    gparams = gmodel.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 4), jnp.int32))
    eng = DecodeEngine(gmodel, gparams, max_batch=2)
    srv = ServingServer(eng, tokenizer=tok, whisper_engine=weng,
                        model_name="mop-audio")
    srv.start()
    yield tok, weng, srv
    srv.stop()


def _post_raw(port, path, body, ctype):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body,
        headers={"Content-Type": ctype})
    return urllib.request.urlopen(req, timeout=120)


def test_v1_audio_transcriptions(audio_server):
    tok, weng, srv = audio_server
    wav = wav_bytes(_tone(), 16000)
    body, ctype = _multipart({"model": "whatever"}, wav)
    with _post_raw(srv.port, "/v1/audio/transcriptions", body,
                   ctype) as r:
        out = json.loads(r.read())
    assert isinstance(out["text"], str) and len(out["text"]) > 0
    # deterministic greedy: same audio -> same text
    with _post_raw(srv.port, "/v1/audio/transcriptions", body,
                   ctype) as r:
        assert json.loads(r.read())["text"] == out["text"]

    # text response format returns the raw string
    body, ctype = _multipart({"response_format": "text"}, wav)
    with _post_raw(srv.port, "/v1/audio/transcriptions", body,
                   ctype) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        assert r.read().decode() == out["text"]

    # a different sample rate resamples (8 kHz upload, same pipeline)
    body, ctype = _multipart({}, wav_bytes(_tone(sr=8000), 8000))
    with _post_raw(srv.port, "/v1/audio/transcriptions", body,
                   ctype) as r:
        assert json.loads(r.read())["text"]

    # engine result equality: drive the whisper engine directly with
    # the endpoint's own feature path and compare
    from mop_tpu.data import load_wav, log_mel, resample as _rs
    audio, sr = load_wav(wav)
    mel = log_mel(_rs(audio, sr, 16000), 16000,
                  n_mels=weng.model.cfg.n_mels, n_frames=weng.t_enc)
    with srv._lock:  # the server's worker thread steps this engine
        rid = weng.submit(mel, max_new_tokens=weng.win - 1)
    import time as _t
    for _ in range(2000):
        with srv._lock:
            if weng.is_done(rid):
                break
        _t.sleep(0.005)
    toks = list(weng.results[rid])
    if weng.eos_id is not None and toks and toks[-1] == weng.eos_id:
        toks = toks[:-1]
    assert tok.decode(toks) == out["text"]


def test_v1_audio_rejections(audio_server, oai_port=None):
    tok, weng, srv = audio_server
    wav = wav_bytes(_tone(), 16000)
    for body, ctype in (
            _multipart({"language": "en"}, wav),
            _multipart({"response_format": "verbose_json"}, wav),
            _multipart({}),                       # no file
            _multipart({}, b"not a wav at all")):  # bad audio
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_raw(srv.port, "/v1/audio/transcriptions", body, ctype)
        assert e.value.code == 400


def test_v1_audio_without_whisper_engine():
    tok = CharTokenizer("ab c")
    cfg = TransformerConfig(n_layer=1, n_head=2, n_embd=32, dropout=0.0,
                            block_size=32)
    model = create_gpt_quartet(tok.vocab_size, cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4), jnp.int32))
    srv = ServingServer(DecodeEngine(model, params, max_batch=1),
                        tokenizer=tok)
    srv.start()
    try:
        body, ctype = _multipart({}, wav_bytes(_tone(), 16000))
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_raw(srv.port, "/v1/audio/transcriptions", body, ctype)
        assert e.value.code == 400
        assert "whisper_engine" in json.loads(
            e.value.read())["error"]["message"]
    finally:
        srv.stop()
