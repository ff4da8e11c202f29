"""GPT autoregressive sampler (beyond-reference capability)."""

import jax
import jax.numpy as jnp
import numpy as np

from mop_tpu.models import TransformerConfig, create_gpt_mop, create_gpt_quartet
from mop_tpu.models.generate import generate


def _setup():
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=16, bias=False)
    model = create_gpt_quartet(40, cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(0), (2, 4), 0, 40)
    params = model.init(jax.random.PRNGKey(1), prompt)
    return model, params, prompt


def test_greedy_generation_shapes_and_determinism():
    model, params, prompt = _setup()
    out1 = generate(model, params, prompt, max_new_tokens=8)
    out2 = generate(model, params, prompt, max_new_tokens=8)
    assert out1.shape == (2, 12)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(out1[:, :4]), np.asarray(prompt))
    assert int(out1.max()) < 40 and int(out1.min()) >= 0


def test_generation_beyond_block_size():
    model, params, prompt = _setup()
    out = generate(model, params, prompt, max_new_tokens=20)  # 4+20 > block 16
    assert out.shape == (2, 24)
    assert bool(jnp.all((out >= 0) & (out < 40)))


def test_sampled_generation_respects_top_k():
    model, params, prompt = _setup()
    out = generate(model, params, prompt, max_new_tokens=6,
                   rng=jax.random.PRNGKey(3), temperature=0.8, top_k=5)
    assert out.shape == (2, 10)


def test_generate_works_for_gpt_mop():
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=16, bias=False)
    model = create_gpt_mop(40, cfg, n_views=2, n_kernels=1)
    prompt = jnp.zeros((1, 3), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt)
    out = generate(model, params, prompt, max_new_tokens=5)
    assert out.shape == (1, 8)


def test_whisper_transcribe_greedy():
    from mop_tpu.models import WhisperConfig, create_whisper_mop
    from mop_tpu.models.generate import whisper_transcribe

    cfg = WhisperConfig(n_layer_enc=1, n_layer_dec=1, n_head=2, n_embd=32,
                        n_mels=16, n_audio_ctx=16, n_text_ctx=8, dropout=0.0,
                        bias=False, n_views=2, n_kernels=1, kernel_size=3,
                        vocab_size=20)
    model = create_whisper_mop(cfg)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16))
    params = model.init(jax.random.PRNGKey(1), mel, jnp.zeros((2, 4), jnp.int32))
    out = whisper_transcribe(model, params, mel, bos_token=19, max_tokens=6)
    assert out.shape == (2, 6)
    assert bool(jnp.all((out >= 0) & (out < 20)))
    # deterministic
    out2 = whisper_transcribe(model, params, mel, bos_token=19, max_tokens=6)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
