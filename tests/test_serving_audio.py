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
    # the endpoint's own feature path (whole-clip mel -> sequential
    # n_audio_ctx windows) and compare
    assert _segmented_engine_text(tok, weng, srv, wav) == out["text"]


def _segmented_engine_text(tok, weng, srv, wav):
    """The endpoint's feature path replayed against the engine
    directly: whole-clip log-mel, t_enc-frame windows, one request per
    window, concatenated per-segment texts."""
    import time as _t

    from mop_tpu.data import load_wav, log_mel, resample as _rs
    from mop_tpu.data import segment_frames

    audio, sr = load_wav(wav)
    mel_full = log_mel(_rs(audio, sr, 16000), 16000,
                       n_mels=weng.model.cfg.n_mels)
    segs = segment_frames(mel_full, weng.t_enc)
    with srv._lock:  # the server's worker thread steps this engine
        rids = [weng.submit(seg, max_new_tokens=weng.win - 1)
                for seg in segs]
    toks = []
    for rid in rids:
        for _ in range(4000):
            with srv._lock:
                if weng.is_done(rid):
                    break
            _t.sleep(0.005)
        seg_toks = list(weng.results[rid])
        if weng.eos_id is not None and seg_toks and \
                seg_toks[-1] == weng.eos_id:
            seg_toks = seg_toks[:-1]
        toks.extend(seg_toks)
    return tok.decode(toks)


def test_v1_audio_long_clip_segments(audio_server):
    """>1-window audio (the 16-frame test window ~ the reference's 1500-
    frame 30 s contract, reference whisper_mop.py:23): the endpoint
    transcribes the WHOLE clip as consecutive windows — equal to the
    per-segment single-stream replay, and longer audio yields more
    segments, not silent truncation."""
    tok, weng, srv = audio_server
    # ~5x the window: 16 frames * 160 hop = 2560 samples per window
    wav_long = wav_bytes(_tone(secs=0.8), 16000)
    body, ctype = _multipart({}, wav_long)
    with _post_raw(srv.port, "/v1/audio/transcriptions", body,
                   ctype) as r:
        long_text = json.loads(r.read())["text"]
    assert long_text == _segmented_engine_text(tok, weng, srv, wav_long)
    # a short clip's text is a prefix-length response, not equal work
    from mop_tpu.data import load_wav, log_mel, segment_frames

    audio, _sr = load_wav(wav_long)
    n_seg = len(segment_frames(
        log_mel(audio, 16000, n_mels=weng.model.cfg.n_mels), weng.t_enc))
    assert n_seg >= 4


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


def test_v1_audio_too_long_is_400_not_429():
    """A clip whose window count exceeds max_queue can NEVER be admitted
    — it must fail permanently (400 'audio too long'), not as a
    retryable 429 that loops forever (code-review r4)."""
    tok = CharTokenizer("ab c")
    wc = WhisperConfig(n_mels=8, n_audio_ctx=16, vocab_size=tok.vocab_size,
                       n_text_ctx=16, n_embd=32, n_head=2,
                       n_layer_enc=1, n_layer_dec=1, dropout=0.0)
    wmodel = create_whisper_mop(wc)
    wparams = wmodel.init(jax.random.PRNGKey(3), jnp.zeros((1, 16, 8)),
                          jnp.zeros((1, 4), jnp.int32))
    weng = WhisperServingEngine(wmodel, wparams, max_batch=2, bos_token=1)
    cfg = TransformerConfig(n_layer=1, n_head=2, n_embd=32, dropout=0.0,
                            block_size=32)
    gmodel = create_gpt_quartet(tok.vocab_size, cfg)
    gparams = gmodel.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 4), jnp.int32))
    srv = ServingServer(DecodeEngine(gmodel, gparams, max_batch=2),
                        tokenizer=tok, whisper_engine=weng, max_queue=2)
    srv.start()
    try:
        # 16-frame windows x 160 hop = 2560 samples each; ~4 windows
        wav = wav_bytes(_tone(secs=0.64), 16000)
        body, ctype = _multipart({}, wav)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_raw(srv.port, "/v1/audio/transcriptions", body, ctype)
        assert e.value.code == 400
        assert "audio too long" in json.loads(
            e.value.read())["error"]["message"]
    finally:
        srv.stop()
