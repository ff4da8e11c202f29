"""AOT export (jax.export serialized StableHLO): deployment artifacts.

Contract: an exported artifact, deserialized from bytes (as a serving
host with no model code would), reproduces model.apply BIT-EXACTLY —
including at batch sizes never seen at export time (symbolic batch
dimension). The reference has no export/deployment story (SURVEY §0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mop_tpu.models import (TransformerConfig, ViT_Baseline,
                            create_gpt_quartet)
from mop_tpu.serving import (export_apply, export_fn, load_exported,
                             save_exported)


@pytest.fixture(scope="module")
def vit():
    model = ViT_Baseline(dim=32, depth=1, heads=2, n_classes=7)
    x = jnp.zeros((2, 3, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def _ref(model):
    """Jitted reference forward: the exported artifact replays the same
    lowered program, so it must match the JITTED apply bit-exactly
    (eager apply can fuse differently and differ in float ulps)."""
    return jax.jit(lambda p, x: model.apply(p, x, train=False))


def test_export_roundtrip_bit_exact(vit):
    model, params = vit
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 32, 32),
                    jnp.float32)
    blob = export_apply(model, params, x)
    assert isinstance(blob, bytes) and len(blob) > 0
    fn = load_exported(blob)
    np.testing.assert_array_equal(np.asarray(fn(params, x)),
                                  np.asarray(_ref(model)(params, x)))


def test_export_polymorphic_batch(vit):
    """One artifact serves batch sizes never seen at export time."""
    model, params = vit
    blob = export_apply(model, params, jnp.zeros((2, 3, 32, 32)))
    fn = load_exported(blob)
    for b in (1, 3, 8):
        x = jnp.asarray(np.random.RandomState(b).randn(b, 3, 32, 32),
                        jnp.float32)
        out = fn(params, x)
        assert out.shape == (b, 7)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(_ref(model)(params, x)))


def test_export_fixed_batch_rejects_other_sizes(vit):
    model, params = vit
    blob = export_apply(model, params, jnp.zeros((2, 3, 32, 32)),
                        poly_batch=False)
    fn = load_exported(blob)
    assert fn(params, jnp.zeros((2, 3, 32, 32))).shape == (2, 7)
    with pytest.raises(ValueError):
        fn(params, jnp.zeros((3, 3, 32, 32)))


def test_export_gpt_lm(vit):
    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=16)
    model = create_gpt_quartet(50, cfg)
    tok = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), tok)
    blob = export_apply(model, params, tok)
    fn = load_exported(blob)
    t = jnp.asarray(np.random.RandomState(3).randint(0, 50, (4, 8)),
                    jnp.int32)
    # TinyTransformerLM returns (logits, loss); loss is None sans targets
    ref = jax.jit(lambda p, x: model.apply(p, x, train=False)[0])
    np.testing.assert_array_equal(np.asarray(fn(params, t)[0]),
                                  np.asarray(ref(params, t)))


def test_export_fn_general_and_save_load(tmp_path):
    def fwd(w, x):
        return jnp.tanh(x @ w).sum(-1)

    w = jnp.asarray(np.random.RandomState(0).randn(4, 4), jnp.float32)
    blob = export_fn(fwd, w, jnp.zeros((2, 4)), poly_batch_args=(1,))
    path = str(tmp_path / "fn.mopx")
    save_exported(path, blob)
    fn = load_exported(path)  # from a filesystem path
    x = jnp.asarray(np.random.RandomState(1).randn(5, 4), jnp.float32)
    np.testing.assert_array_equal(np.asarray(fn(w, x)),
                                  np.asarray(jax.jit(fwd)(w, x)))
    # artifact metadata is inspectable
    assert "cpu" in [p.lower() for p in fn.exported.platforms]


def test_export_dual_platform_artifact(vit):
    """platforms=('cpu','tpu'): one artifact lowered for both targets;
    it must still run (on whatever backend the host has) and expose both
    platforms in its metadata."""
    model, params = vit
    x = jnp.zeros((2, 3, 32, 32))
    blob = export_apply(model, params, x, platforms=("cpu", "tpu"))
    fn = load_exported(blob)
    assert sorted(p.lower() for p in fn.exported.platforms) == \
        ["cpu", "tpu"]
    np.testing.assert_array_equal(np.asarray(fn(params, x)),
                                  np.asarray(_ref(model)(params, x)))
