"""Weight-only int8 quantization for the decode/serving path
(beyond-reference capability: the reference has no inference story at all,
``mop/models/gpt_mop.py:181-207`` stops at teacher-forced logits)."""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from mop_tpu.models import TransformerConfig, create_gpt_quartet
from mop_tpu.models.generate import decode_step, generate_cached, prefill
from mop_tpu.ops.quant import (QTensor, dequantize_params, qmatmul, quantize,
                               quantize_params, quantized_bytes)


def test_quantize_roundtrip_error_bound():
    """Dequantized weight is within half a grid step of the original,
    per output channel."""
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 96)) * 0.05
    qt = quantize(w)
    assert qt.q.dtype == jnp.int8
    assert qt.scale.shape == (1, 96)
    err = np.abs(np.asarray(qt.dequant() - w))
    bound = np.asarray(qt.scale) / 2 + 1e-7
    assert (err <= bound).all()


def test_quantize_respects_channel_axis():
    w = jnp.array([[1.0, 100.0], [0.5, -50.0]])
    qt = quantize(w, channel_axis=-1)
    # column 0's grid is set by 1.0, not by column 1's 100.0
    np.testing.assert_allclose(np.asarray(qt.scale[0]), [1.0 / 127, 100.0 / 127])
    np.testing.assert_allclose(np.asarray(qt.dequant()), np.asarray(w),
                               rtol=0, atol=0.5)


def test_qmatmul_matches_dequantized_matmul():
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (4, 64))
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 32)) * 0.1
    qt = quantize(w)
    np.testing.assert_allclose(
        np.asarray(qmatmul(x, qt)), np.asarray(x @ qt.dequant()),
        rtol=1e-5, atol=1e-5)


def _gpt_setup():
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=16)
    model = create_gpt_quartet(50, cfg)
    idx = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, 50)
    params = model.init(jax.random.PRNGKey(1), idx)
    return model, params, idx


def test_quantize_params_structure_and_bytes():
    model, params, _ = _gpt_setup()
    qp = quantize_params(params, min_size=0)
    p = qp["params"]
    assert isinstance(p["blocks_0"]["attn"]["q_proj"]["kernel"], QTensor)
    assert isinstance(p["blocks_1"]["mlp"]["fc"]["kernel"], QTensor)
    # embeddings / LN / scalars untouched
    assert not isinstance(p["wte"]["embedding"], QTensor)
    assert not isinstance(p["blocks_0"]["ln1"]["scale"], QTensor)
    stored, fp32 = quantized_bytes(qp)
    assert stored < fp32  # int8 kernels shrink the weight footprint
    # min_size gate: huge threshold -> nothing quantized
    qp_none = quantize_params(params, min_size=10**9)
    assert not any(isinstance(l, QTensor) for l in jax.tree_util.tree_leaves(
        qp_none, is_leaf=lambda l: isinstance(l, QTensor)))


def test_quantized_prefill_and_decode_match_dequantized():
    """The int8 decode path must compute exactly the dequantized-weight
    math (up to matmul reassociation): prefill logits, cache rows, and a
    decode step all agree with running the fp dequantized params."""
    model, params, idx = _gpt_setup()
    qp = quantize_params(params, min_size=0)
    dq = dequantize_params(qp)

    lg_q, cache_q = prefill(model, qp, idx)
    lg_d, cache_d = prefill(model, dq, idx)
    np.testing.assert_allclose(np.asarray(lg_q), np.asarray(lg_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cache_q["k"]),
                               np.asarray(cache_d["k"]),
                               rtol=1e-4, atol=1e-4)

    tok = jnp.argmax(lg_d, -1).astype(jnp.int32)
    l2_q, _ = decode_step(model, qp, cache_q, tok)
    l2_d, _ = decode_step(model, dq, cache_d, tok)
    np.testing.assert_allclose(np.asarray(l2_q), np.asarray(l2_d),
                               rtol=1e-4, atol=1e-4)


def test_generate_cached_accepts_quantized_params():
    model, params, idx = _gpt_setup()
    qp = quantize_params(params, min_size=0)
    out = generate_cached(model, qp, idx, max_new_tokens=6)
    assert out.shape == (2, 14)
    assert bool(jnp.all((out >= 0) & (out < 50)))
    # prompt passthrough + determinism
    np.testing.assert_array_equal(np.asarray(out[:, :8]), np.asarray(idx))
    out2 = generate_cached(model, qp, idx, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_quantized_logit_error_is_small():
    """End-to-end logit perturbation from int8 weights stays in the
    sub-percent class on a random-init model (grid error <=0.4% per
    weight)."""
    model, params, idx = _gpt_setup()
    qp = quantize_params(params, min_size=0)
    lg_fp, _ = prefill(model, params, idx)
    lg_q, _ = prefill(model, qp, idx)
    denom = np.maximum(np.abs(np.asarray(lg_fp)).max(), 1e-6)
    rel = np.abs(np.asarray(lg_q) - np.asarray(lg_fp)).max() / denom
    assert rel < 0.05, rel


def test_whisper_cached_transcribe_accepts_quantized_params():
    from mop_tpu.models import (WhisperConfig, create_whisper_mop,
                                whisper_transcribe_cached)

    wc = WhisperConfig(n_mels=16, n_audio_ctx=24, vocab_size=40,
                       n_text_ctx=16, n_embd=32, n_head=2,
                       n_layer_enc=2, n_layer_dec=2, dropout=0.0)
    model = create_whisper_mop(wc)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 16))
    ids0 = jnp.zeros((2, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), mel, ids0)
    qp = quantize_params(params, min_size=0)
    out = whisper_transcribe_cached(model, qp, mel, bos_token=3,
                                    max_tokens=8)
    assert out.shape == (2, 8)
    assert bool(jnp.all((out >= 0) & (out < 40)))


# ------------------------------- int4 -------------------------------


def test_quantize4_pack_unpack_roundtrip():
    """Packing then unpacking is the identity on int4 grid values."""
    from mop_tpu.ops.quant import quantize4

    w = jax.random.normal(jax.random.PRNGKey(3), (128, 48)) * 0.05
    qt = quantize4(w, group=32, clip_search=0)  # max-abs scale: exact bound
    assert qt.q.dtype == jnp.int8 and qt.q.shape == (64, 48)
    assert qt.scale.shape == (4, 48)
    qi = np.asarray(qt.unpack())
    assert qi.shape == (128, 48)
    assert qi.min() >= -7 and qi.max() <= 7
    # error within half a grid step of the owning group's scale
    err = np.abs(np.asarray(qt.dequant()) - np.asarray(w))
    bound = np.repeat(np.asarray(qt.scale), 32, axis=0) / 2 + 1e-7
    assert (err <= bound).all()


def test_quantize4_clip_search_reduces_mse():
    """The AWQ-style clip-ratio search never increases round-trip MSE,
    and strictly reduces it on heavy-tailed weights (outlier rows stretch
    the max-abs grid)."""
    from mop_tpu.ops.quant import quantize4

    key = jax.random.PRNGKey(9)
    w = jax.random.normal(key, (256, 64)) * 0.02
    # plant outliers: one row per group at 8x typical magnitude
    w = w.at[::64].multiply(8.0)
    err = lambda qt: float(jnp.mean((qt.dequant() - w) ** 2))
    e_plain = err(quantize4(w, group=64, clip_search=0))
    e_search = err(quantize4(w, group=64))
    assert e_search <= e_plain * (1 + 1e-6)
    assert e_search < e_plain * 0.9, (e_search, e_plain)


def test_quantize4_group_fallback_and_odd_dim():
    from mop_tpu.ops.quant import quantize4

    w = jnp.ones((10, 4)) * 0.3
    qt = quantize4(w, group=64)  # 10 % 64 != 0 -> whole-column group
    assert qt.scale.shape == (1, 4)
    np.testing.assert_allclose(np.asarray(qt.dequant()), 0.3, rtol=0.1)
    try:
        quantize4(jnp.ones((9, 4)))
        assert False, "odd input dim must raise"
    except ValueError:
        pass


def test_q4matmul_matches_dequantized_matmul():
    from mop_tpu.ops.quant import q4matmul, quantize4

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 32)) * 0.1
    qt = quantize4(w, group=16)
    np.testing.assert_allclose(np.asarray(q4matmul(x, qt)),
                               np.asarray(x @ qt.dequant()),
                               rtol=1e-5, atol=1e-5)


def test_generate_cached_accepts_int4_params():
    from mop_tpu.ops.quant import Q4Tensor

    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=32)
    model = create_gpt_quartet(40, cfg)
    prompt = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt)
    q4 = quantize_params(params, min_size=0, bits=4, group=16)
    assert isinstance(q4["params"]["blocks_0"]["attn"]["q_proj"]["kernel"],
                      Q4Tensor)
    out = generate_cached(model, q4, prompt, max_new_tokens=6)
    assert out.shape == (1, 10)
    # int4 stores strictly fewer bytes than int8
    s8, _ = quantized_bytes(quantize_params(params, min_size=0))
    s4, _ = quantized_bytes(q4)
    assert s4 < s8


def test_int4_logit_error_reasonable():
    """Group-wise int4 logit drift stays bounded (looser than int8)."""
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=64, dropout=0.0,
                            block_size=32)
    model = create_gpt_quartet(64, cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(4), (2, 8), 0, 64)
    params = model.init(jax.random.PRNGKey(0), prompt)
    ref_logits, _ = prefill(model, params, prompt)
    q4 = quantize_params(params, min_size=0, bits=4, group=16)
    q4_logits, _ = prefill(model, q4, prompt)
    ref = np.asarray(ref_logits)
    err = np.abs(np.asarray(q4_logits) - ref)
    assert err.max() / (np.abs(ref).max() + 1e-9) < 0.2, err.max()
