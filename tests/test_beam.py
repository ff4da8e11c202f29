"""Beam-search decode: oracle equality, score bookkeeping, EOS handling."""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from mop_tpu.models import (TransformerConfig, create_gpt_baseline,
                            create_gpt_quartet, generate_beam,
                            generate_cached)
from mop_tpu.models.generate import decode_step, prefill


def _setup(vocab=9, block=16, quartet=True, b=2, t0=4):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=block, bias=False)
    make = create_gpt_quartet if quartet else create_gpt_baseline
    model = make(vocab, cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(0), (b, t0), 0, vocab)
    params = model.init(jax.random.PRNGKey(1), prompt)
    return model, params, prompt


def _forced_logprob(model, params, prompt, cont):
    """Cumulative log-prob of forced continuations under the SAME cached
    decode semantics beam search uses. prompt (B, T0), cont (B, n) ->
    (B,) float32."""
    logits, cache = prefill(model, params, prompt.astype(jnp.int32))
    total = jnp.zeros((prompt.shape[0],), jnp.float32)
    rows = jnp.arange(prompt.shape[0])
    for j in range(cont.shape[1]):
        logp = jax.nn.log_softmax(logits, -1)
        total = total + logp[rows, cont[:, j]]
        if j + 1 < cont.shape[1]:
            logits, cache = decode_step(model, params, cache, cont[:, j])
    return total


def test_beam1_equals_greedy():
    model, params, prompt = _setup()
    ref = generate_cached(model, params, prompt, max_new_tokens=8)
    out = generate_beam(model, params, prompt, max_new_tokens=8,
                        num_beams=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_beam_exhaustive_two_steps():
    """With num_beams == vocab, a 2-step search enumerates ALL V^2
    continuations — the result must equal the brute-force argmax of forced
    cumulative log-prob."""
    v = 7
    model, params, prompt = _setup(vocab=v, b=2)
    out = generate_beam(model, params, prompt, max_new_tokens=2,
                        num_beams=v, length_penalty=0.0)
    t0 = prompt.shape[1]
    for row in range(prompt.shape[0]):
        grid = np.stack(np.meshgrid(np.arange(v), np.arange(v),
                                    indexing="ij"), -1).reshape(-1, 2)
        rp = jnp.broadcast_to(prompt[row], (grid.shape[0], t0))
        scores = np.asarray(_forced_logprob(model, params, rp,
                                            jnp.asarray(grid, jnp.int32)))
        best = grid[int(np.argmax(scores))]
        np.testing.assert_array_equal(np.asarray(out[row, t0:]), best)


def test_beam_scores_match_forced_recompute_and_beat_greedy():
    """The reported score of every returned beam must equal the forced
    cumulative log-prob of its token sequence (validates the cache/parent
    gathers), and the best beam must score >= the greedy sequence."""
    model, params, prompt = _setup(vocab=9)
    seqs, scores = generate_beam(model, params, prompt, max_new_tokens=5,
                                 num_beams=4, length_penalty=0.0,
                                 return_all=True)
    t0 = prompt.shape[1]
    b, k = scores.shape
    assert seqs.shape == (b, k, t0 + 5)
    # sorted best-first
    s = np.asarray(scores)
    assert (np.diff(s, axis=-1) <= 1e-6).all()
    for row in range(b):
        cont = seqs[row, :, t0:]
        rp = jnp.broadcast_to(prompt[row], (k, t0))
        forced = np.asarray(_forced_logprob(model, params, rp, cont))
        np.testing.assert_allclose(s[row], forced, rtol=0, atol=1e-4)
    greedy = generate_cached(model, params, prompt, max_new_tokens=5)
    gscore = np.asarray(_forced_logprob(model, params, prompt,
                                        greedy[:, t0:]))
    assert (s[:, 0] >= gscore - 1e-5).all()


def test_beam_eos_freezes_and_pads():
    """Force EOS to be the greedy first token: that beam must finish at
    length 1, pad the rest with eos_id, and keep its 1-token score."""
    model, params, prompt = _setup(vocab=9, b=1)
    greedy = generate_cached(model, params, prompt, max_new_tokens=1)
    eos = int(greedy[0, -1])
    seqs, scores = generate_beam(model, params, prompt, max_new_tokens=6,
                                 num_beams=3, eos_id=eos,
                                 length_penalty=0.0, return_all=True)
    t0 = prompt.shape[1]
    arr = np.asarray(seqs[0])
    fin = [i for i in range(3) if arr[i, t0] == eos]
    assert fin, "greedy top-1 first token must appear among 3 beams"
    i = fin[0]
    assert (arr[i, t0:] == eos).all()
    one = np.asarray(_forced_logprob(
        model, params, prompt, jnp.asarray([[eos]], jnp.int32)))[0]
    np.testing.assert_allclose(np.asarray(scores[0, i]), one, atol=1e-5)


def test_beam_length_penalty_changes_ranking_monotonically():
    """length_penalty only rescales by length; with eos disabled all beams
    share one length, so rankings are identical for any penalty."""
    model, params, prompt = _setup(vocab=9)
    a, _ = generate_beam(model, params, prompt, max_new_tokens=4,
                         num_beams=3, length_penalty=0.0, return_all=True)
    c, _ = generate_beam(model, params, prompt, max_new_tokens=4,
                         num_beams=3, length_penalty=2.0, return_all=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_beam_validates_args():
    import pytest
    model, params, prompt = _setup(vocab=9)
    with pytest.raises(ValueError, match="num_beams"):
        generate_beam(model, params, prompt, 4, num_beams=0)
    with pytest.raises(ValueError, match="vocab_size"):
        generate_beam(model, params, prompt, 4, num_beams=10)
    with pytest.raises(ValueError, match="block_size"):
        generate_beam(model, params, prompt, 400, num_beams=2)


def test_beam_int8_cache_runs():
    model, params, prompt = _setup(vocab=9, quartet=False)
    out = generate_beam(model, params, prompt, max_new_tokens=4,
                        num_beams=3, kv_dtype=jnp.int8)
    assert out.shape == (2, 8)
    assert bool(jnp.all((out >= 0) & (out < 9)))


# ------------------------------ whisper beam ------------------------------

def _whisper():
    from mop_tpu.models import WhisperConfig, create_whisper_mop
    wc = WhisperConfig(n_mels=16, n_audio_ctx=24, vocab_size=12,
                       n_text_ctx=16, n_embd=32, n_head=2,
                       n_layer_enc=1, n_layer_dec=2, dropout=0.0)
    model = create_whisper_mop(wc)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 16))
    params = model.init(jax.random.PRNGKey(1), mel,
                        jnp.zeros((2, 4), jnp.int32))
    return model, params, mel


def test_whisper_beam1_equals_greedy_cached():
    from mop_tpu.models import whisper_transcribe_beam, \
        whisper_transcribe_cached
    model, params, mel = _whisper()
    greedy = whisper_transcribe_cached(model, params, mel, bos_token=3,
                                       max_tokens=8)
    beam = whisper_transcribe_beam(model, params, mel, bos_token=3,
                                   max_tokens=8, num_beams=1)
    np.testing.assert_array_equal(np.asarray(beam), np.asarray(greedy))


def test_whisper_beam_exhaustive_two_steps():
    """num_beams == vocab at 2 steps enumerates all V^2 continuations;
    the winner must equal brute-force teacher-forced argmax (the Whisper
    cache is exact, so model.decode scoring IS the beam's scoring)."""
    from mop_tpu.models import whisper_transcribe_beam
    model, params, mel = _whisper()
    v, bos = 12, 3
    out = whisper_transcribe_beam(model, params, mel, bos_token=bos,
                                  max_tokens=2, num_beams=v,
                                  length_penalty=0.0)
    enc_out, _ = model.apply(params, mel, method=model.encode)
    grid = np.stack(np.meshgrid(np.arange(v), np.arange(v),
                                indexing="ij"), -1).reshape(-1, 2)
    for row in range(mel.shape[0]):
        ids = np.concatenate(
            [np.full((v * v, 1), bos), grid], axis=1).astype(np.int32)
        logits = model.apply(params, enc_out[row:row + 1].repeat(v * v, 0),
                             jnp.asarray(ids), method=model.decode)
        logp = np.asarray(jax.nn.log_softmax(logits, -1))
        score = (logp[np.arange(v * v), 0, grid[:, 0]]
                 + logp[np.arange(v * v), 1, grid[:, 1]])
        best = grid[int(np.argmax(score))]
        np.testing.assert_array_equal(np.asarray(out[row]), best)


def test_whisper_beam_eos_pads_and_sorted_scores():
    from mop_tpu.models import whisper_transcribe_beam, \
        whisper_transcribe_cached
    model, params, mel = _whisper()
    greedy = whisper_transcribe_cached(model, params, mel, bos_token=3,
                                       max_tokens=1)
    eos = int(greedy[0, 0])
    seqs, scores = whisper_transcribe_beam(
        model, params, mel, bos_token=3, max_tokens=6, num_beams=3,
        eos_id=eos, length_penalty=0.0, return_all=True)
    s = np.asarray(scores)
    assert (np.diff(s, axis=-1) <= 1e-6).all()
    arr = np.asarray(seqs[0])
    fin = [i for i in range(3) if arr[i, 0] == eos]
    assert fin and (arr[fin[0]] == eos).all()
