"""Op-level tests: fused flash attention (interpret mode), routed MoE, log-mel."""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import mop_tpu.ops.attention as ref
import mop_tpu.ops.fused as F
from mop_tpu.ops import moe
from mop_tpu.ops.mel import log_mel_spectrogram


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_matches_reference(causal):
    rng = jax.random.PRNGKey(0)
    b, h, n, dk = 2, 4, 64, 56
    q = jax.random.normal(rng, (b, h, n, dk))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, n, dk))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, n, dk))
    with pltpu.force_tpu_interpret_mode():
        o = F.flash_attention(q, k, v, causal=causal, force=True)
    o_ref = ref.attend(q, k, v, ref.causal_mask(n) if causal else None)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5)


def test_flash_attention_grads_match():
    rng = jax.random.PRNGKey(0)
    b, h, n, dk = 1, 2, 32, 16
    q = jax.random.normal(rng, (b, h, n, dk))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, n, dk))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, n, dk))

    def loss_fused(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return (F.flash_attention(q, k, v, causal=True, force=True) ** 2).sum()

    def loss_ref(q, k, v):
        return (ref.attend(q, k, v, ref.causal_mask(n)) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_flash_fallback_off_supported_shapes():
    # n=7 not divisible by any block size -> falls back to the XLA path.
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (1, 2, 7, 8))
    o = F.flash_attention(q, q, q, causal=False)
    o_ref = ref.attend(q, q, q)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=1e-5)


def test_routed_moe_matches_dense_when_capacity_suffices():
    rng = jax.random.PRNGKey(0)
    t, d, e, hdim = 64, 16, 4, 32
    x = jax.random.normal(rng, (t, d))
    gate_w = jax.random.normal(jax.random.fold_in(rng, 1), (d, e)) * 0.1
    gate_b = jnp.zeros((e,))
    w1 = jax.random.normal(jax.random.fold_in(rng, 2), (e, d, hdim)) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(rng, 3), (e, hdim, d)) * 0.1
    act = jax.nn.gelu
    dense = moe.dense_top1_mlp(x, gate_w, gate_b, w1, w2, act)
    # capacity_factor = E guarantees no token is dropped (C = T).
    routed = moe.top1_routed_mlp(x, gate_w, gate_b, w1, w2, act,
                                 capacity_factor=float(e))
    np.testing.assert_allclose(np.asarray(routed), np.asarray(dense), atol=1e-5)


def test_routed_moe_drops_overflow_to_zero():
    t, d, e, hdim = 8, 4, 2, 8
    x = jnp.ones((t, d))
    # Gate forces every token to expert 0.
    gate_w = jnp.zeros((d, e))
    gate_b = jnp.asarray([10.0, -10.0])
    w1 = jnp.ones((e, d, hdim))
    w2 = jnp.ones((e, hdim, d))
    out = moe.top1_routed_mlp(x, gate_w, gate_b, w1, w2, jax.nn.relu,
                              capacity_factor=0.5)  # C = 2 of 8 kept
    nonzero_rows = int(jnp.sum(jnp.any(out != 0, axis=-1)))
    assert nonzero_rows == 2


@pytest.mark.parametrize("model_parallel", [8, 4])
def test_expert_parallel_moe_matches_dense(model_parallel):
    """Experts partitioned over the mesh 'model' axis, tokens all_to_all'd:
    must equal the dense compute-all-experts path when capacity suffices."""
    from mop_tpu.parallel import make_mesh

    mesh = make_mesh(n_devices=8, model_parallel=model_parallel)
    rng = jax.random.PRNGKey(0)
    t, d, e, hdim = 64, 16, 8, 32
    x = jax.random.normal(rng, (t, d))
    gate_w = jax.random.normal(jax.random.fold_in(rng, 1), (d, e)) * 0.1
    gate_b = jnp.zeros((e,))
    w1 = jax.random.normal(jax.random.fold_in(rng, 2), (e, d, hdim)) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(rng, 3), (e, hdim, d)) * 0.1
    dense = moe.dense_top1_mlp(x, gate_w, gate_b, w1, w2, jax.nn.gelu)
    with mesh:
        ep = moe.expert_parallel_top1_mlp(
            x, gate_w, gate_b, w1, w2, jax.nn.gelu, mesh,
            capacity_factor=float(e))
    np.testing.assert_allclose(np.asarray(ep), np.asarray(dense), atol=1e-5)


def test_expert_parallel_moe_grads_match_dense():
    """Training THROUGH the expert-parallel path: grads wrt x/w1/w2 must
    equal the dense compute-all-experts path (the all_to_all pair and the
    capacity scatter/gather all have exact transposes)."""
    from mop_tpu.parallel import make_mesh

    mesh = make_mesh(n_devices=8, model_parallel=8)
    rng = jax.random.PRNGKey(0)
    t, d, e, hdim = 64, 16, 8, 32
    x = jax.random.normal(rng, (t, d))
    gate_w = jax.random.normal(jax.random.fold_in(rng, 1), (d, e)) * 0.1
    gate_b = jnp.zeros((e,))
    w1 = jax.random.normal(jax.random.fold_in(rng, 2), (e, d, hdim)) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(rng, 3), (e, hdim, d)) * 0.1
    w = jnp.cos(jnp.arange(d, dtype=jnp.float32))

    def loss_ep(x, w1, w2):
        with mesh:
            out = moe.expert_parallel_top1_mlp(
                x, gate_w, gate_b, w1, w2, jax.nn.gelu, mesh,
                capacity_factor=float(e))
        return jnp.sum(out * w)

    def loss_dense(x, w1, w2):
        return jnp.sum(moe.dense_top1_mlp(
            x, gate_w, gate_b, w1, w2, jax.nn.gelu) * w)

    g_ep = jax.grad(loss_ep, argnums=(0, 1, 2))(x, w1, w2)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(g_ep, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_expert_parallel_moe_drops_overflow():
    from mop_tpu.parallel import make_mesh

    mesh = make_mesh(n_devices=8, model_parallel=8)
    t, d, e, hdim = 64, 16, 8, 32
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (t, d))
    gate_w = jax.random.normal(jax.random.fold_in(rng, 1), (d, e)) * 0.1
    gate_b = jnp.zeros((e,))
    w1 = jnp.ones((e, d, hdim)) * 0.1
    w2 = jnp.ones((e, hdim, d)) * 0.1
    with mesh:
        out = moe.expert_parallel_top1_mlp(
            x, gate_w, gate_b, w1, w2, jax.nn.relu, mesh,
            capacity_factor=0.25)
    nz = int(jnp.sum(jnp.any(out != 0, axis=-1)))
    assert 0 < nz < t  # some tokens dropped, some kept


def test_log_mel_shapes_and_range():
    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (2, 16000)) * 0.1  # 1s at 16kHz
    mel = log_mel_spectrogram(audio, n_fft=400, hop=160, n_mels=80)
    assert mel.shape[0] == 2 and mel.shape[2] == 80
    assert mel.shape[1] == 1 + 16000 // 160
    assert bool(jnp.isfinite(mel).all())
    # pure tone concentrates energy in few mel bins
    t = jnp.arange(16000) / 16000.0
    tone = jnp.sin(2 * jnp.pi * 440.0 * t)[None, :]
    m = log_mel_spectrogram(tone)
    peak_bin = int(jnp.argmax(jnp.mean(m[0], axis=0)))
    assert 0 < peak_bin < 40  # 440 Hz lands in the lower mel range


def test_fused_multihop_matches_reference():
    rng = jax.random.PRNGKey(0)
    b, h, n, dk = 1, 2, 32, 16
    mk = lambda i: jax.random.normal(jax.random.fold_in(rng, i), (b, h, n, dk))
    q1, k1, v1, q2, k2, v2 = (mk(i) for i in range(6))
    gates = dict(base=1.0, and_=1.0, or_=0.5, not_=0.25, chain=0.75)
    w = jnp.asarray(0.3)

    with pltpu.force_tpu_interpret_mode():
        o = F.fused_multihop_attention(q1, k1, v1, q2, k2, v2,
                                       gates=gates, beta_not=0.5, hops=3,
                                       chain_w=w, force=True)
    o_ref = F.fused_multihop_attention(q1, k1, v1, q2, k2, v2,
                                       gates=gates, beta_not=0.5, hops=3,
                                       chain_w=w, force=False)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=3e-5)

    # grads through the custom VJP (recompute backward)
    def loss_fused(q1, v2):
        with pltpu.force_tpu_interpret_mode():
            return (F.fused_multihop_attention(
                q1, k1, v1, q2, k2, v2, gates=gates, beta_not=0.5,
                hops=3, chain_w=w, force=True) ** 2).sum()

    def loss_ref(q1, v2):
        return (F.fused_multihop_attention(
            q1, k1, v1, q2, k2, v2, gates=gates, beta_not=0.5,
            hops=3, chain_w=w, force=False) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1))(q1, v2)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(q1, v2)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_multihop_msa_consistent_with_fused_flag():
    """MultiHopMSA output must be identical with the fused flag on and off on
    CPU (fallback) — the flag must not change semantics."""
    from mop_tpu import config as mcfg
    from mop_tpu.models import MultiHopMSA

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32))
    m = MultiHopMSA(dim=32, heads=4, hops=3,
                    gates=dict(base=1.0, and_=1.0, or_=0.5, not_=0.2, chain=0.5))
    p = m.init(jax.random.PRNGKey(1), x)
    old = mcfg.config.fused_multihop
    try:
        mcfg.config.fused_multihop = True
        y1 = m.apply(p, x)
        mcfg.config.fused_multihop = False
        y2 = m.apply(p, x)
    finally:
        mcfg.config.fused_multihop = old
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_fused_edgewise_lowrank_matches_module(monkeypatch):
    """EdgewiseMSA eval output via the fused kernel (interpret mode) must match
    the composed reference path."""
    from mop_tpu import config as mcfg
    from mop_tpu.models import EdgewiseMSA

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    m = EdgewiseMSA(dim=32, heads=4, n_views=3, share_qkv=True,
                    gate_mode="lowrank", gate_rank=2, gate_init="mix5",
                    beta_not=0.5)
    p = m.init(jax.random.PRNGKey(1), x)

    old = mcfg.config.fused_attention
    try:
        mcfg.config.fused_attention = False
        y_ref = m.apply(p, x)
        mcfg.config.fused_attention = True
        monkeypatch.setattr(F, "_on_tpu", lambda: True)
        with pltpu.force_tpu_interpret_mode():
            y_fused = m.apply(p, x)
    finally:
        mcfg.config.fused_attention = old
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_edgewise_unshared_qkv(monkeypatch):
    from mop_tpu import config as mcfg
    from mop_tpu.models import EdgewiseMSA

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32))
    m = EdgewiseMSA(dim=32, heads=2, n_views=2, share_qkv=False,
                    gate_mode="lowrank", gate_rank=4, gate_init="and")
    p = m.init(jax.random.PRNGKey(1), x)
    old = mcfg.config.fused_attention
    try:
        mcfg.config.fused_attention = False
        y_ref = m.apply(p, x)
        mcfg.config.fused_attention = True
        monkeypatch.setattr(F, "_on_tpu", lambda: True)
        with pltpu.force_tpu_interpret_mode():
            y_fused = m.apply(p, x)
    finally:
        mcfg.config.fused_attention = old
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_edgewise_grads_match_reference(monkeypatch):
    """Training grads via the fused backward kernel (in-kernel VJP, interpret
    mode) must match XLA autodiff over the composed reference path — for every
    param of the EdgewiseMSA module, plus the input."""
    from mop_tpu import config as mcfg
    from mop_tpu.models import EdgewiseMSA

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    m = EdgewiseMSA(dim=32, heads=4, n_views=3, share_qkv=True,
                    gate_mode="lowrank", gate_rank=2, gate_init="mix5",
                    beta_not=0.5, attn_drop=0.0, proj_drop=0.0)
    p = m.init(jax.random.PRNGKey(1), x)
    dy = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 32))

    def loss_fused(p, x):
        with pltpu.force_tpu_interpret_mode():
            y = m.apply(p, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
        return (y * dy).sum()

    def loss_ref(p, x):
        y = m.apply(p, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
        return (y * dy).sum()

    old_fa, old_tr = mcfg.config.fused_attention, mcfg.config.fused_edgewise_train
    try:
        mcfg.config.fused_attention = True
        mcfg.config.fused_edgewise_train = True
        monkeypatch.setattr(F, "_on_tpu", lambda: True)
        g1 = jax.grad(loss_fused, argnums=(0, 1))(p, x)
        mcfg.config.fused_attention = False
        g2 = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    finally:
        mcfg.config.fused_attention = old_fa
        mcfg.config.fused_edgewise_train = old_tr

    flat1, tree1 = jax.tree_util.tree_flatten_with_path(g1)
    flat2, _ = jax.tree_util.tree_flatten_with_path(g2)
    assert len(flat1) == len(flat2)
    for (path, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("n,dk,v_,r", [
    (8, 4, 2, 1), (32, 16, 4, 4), (64, 8, 5, 2), (128, 32, 3, 4),
])
def test_fused_edgewise_shape_sweep_matches_composed(monkeypatch, n, dk, v_, r):
    """Interpret-mode sweep across the dispatch envelope (N, dk, views,
    rank): kernel forward must match the composed XLA math everywhere."""
    from mop_tpu.ops import attention as A2
    from mop_tpu.ops import fused as F2

    rng = jax.random.PRNGKey(n * 1000 + dk)
    b, h = 1, 2
    qs = jax.random.normal(rng, (b, h, v_, n, dk))
    ks = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, v_, n, dk))
    vs = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, v_, n, dk))
    c = 2 * v_ + 2
    wrow = jax.random.normal(jax.random.fold_in(rng, 3), (c, 4 * r)) * 0.3
    brow = jnp.linspace(-0.5, 0.5, 4 * r)
    wcol = jax.random.normal(jax.random.fold_in(rng, 4), (c, 4 * r)) * 0.3
    bcol = jnp.linspace(0.5, -0.5, 4 * r)
    beta_not, chain_w = 0.7, jnp.asarray(0.4)

    monkeypatch.setattr(F2, "_on_tpu", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        y_fused = F2.fused_edgewise_lowrank_attention(
            qs, ks, vs, wrow, brow, wcol, bcol, beta_not=beta_not,
            chain_w=chain_w, force=True)

    # Composed reference: same math via ops.attention primitives.
    s_list = [A2.scaled_scores(qs[:, :, i], ks[:, :, i]) for i in range(v_)]
    a_list = [jax.nn.softmax(s, -1) for s in s_list]
    c_fwd = A2.chain_product(a_list)
    log_cf = jnp.log(c_fwd + 1e-6)
    log_cb = jnp.log(A2.chain_product(a_list[::-1]) + 1e-6)
    rowf = jnp.concatenate(
        [jnp.mean(s, -1, keepdims=True) for s in s_list]
        + [jnp.mean(s, -2, keepdims=True).swapaxes(-1, -2) for s in s_list]
        + [jnp.mean(log_cf, -1, keepdims=True),
           jnp.mean(log_cb, -1, keepdims=True)], -1)
    colf = jnp.concatenate(
        [jnp.mean(s, -2, keepdims=True).swapaxes(-1, -2) for s in s_list]
        + [jnp.mean(s, -1, keepdims=True) for s in s_list]
        + [jnp.mean(log_cf, -2, keepdims=True).swapaxes(-1, -2),
           jnp.mean(log_cb, -2, keepdims=True).swapaxes(-1, -2)], -1)
    a_fac = rowf @ wrow + brow
    b_fac = colf @ wcol + bcol
    gates = [jax.nn.sigmoid(jnp.einsum(
        "...nr,...mr->...nm", a_fac[..., i * r:(i + 1) * r],
        b_fac[..., i * r:(i + 1) * r])) for i in range(4)]
    s1 = s_list[0]
    s_sum = sum(s_list)
    lse = A2.lse_stack(s_list)
    mean_others = (s_sum - s1) / max(1, v_ - 1)
    smix = (s1 + gates[0] * (s_sum - s1) + gates[1] * (lse - s1)
            - gates[2] * beta_not * mean_others + gates[3] * log_cf)
    att = jax.nn.softmax(smix, -1)
    transport = vs[:, :, v_ - 1]
    for i in range(v_ - 1, 0, -1):
        transport = jnp.einsum("...nm,...md->...nd", a_list[i], transport)
    y_ref = (jnp.einsum("...nm,...md->...nd", att, vs[:, :, 0])
             + chain_w * jnp.einsum("...nm,...md->...nd", a_list[0], transport))
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_edgewise_bf16_operands_close_to_fp32(monkeypatch):
    """The kernel's MXU matmuls take the input dtype (bf16 at train) with
    fp32 accumulation; softmax/gate/logit algebra stays fp32. bf16-input
    results must track the fp32 path within bf16 resolution."""
    from mop_tpu.ops import fused as F2

    rng = jax.random.PRNGKey(0)
    b, h, v_, n, dk = 1, 2, 3, 16, 8
    r = 2
    qs = jax.random.normal(rng, (b, h, v_, n, dk))
    ks = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, v_, n, dk))
    vs = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, v_, n, dk))
    c = 2 * v_ + 2
    wrow = jax.random.normal(jax.random.fold_in(rng, 3), (c, 4 * r)) * 0.3
    brow = jnp.zeros((4 * r,))
    wcol = jax.random.normal(jax.random.fold_in(rng, 4), (c, 4 * r)) * 0.3
    bcol = jnp.zeros((4 * r,))

    def run(dtype):
        with pltpu.force_tpu_interpret_mode():
            return F2.fused_edgewise_lowrank_attention(
                qs.astype(dtype), ks.astype(dtype), vs.astype(dtype),
                wrow, brow, wcol, bcol, beta_not=0.5,
                chain_w=jnp.asarray(0.3), force=True)

    monkeypatch.setattr(F2, "_on_tpu", lambda: True)
    y32 = run(jnp.float32)
    y16 = run(jnp.bfloat16)
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y16, np.float32), np.asarray(y32),
                               atol=0.05, rtol=0.05)


@pytest.mark.parametrize("use_k3", [False, True])
def test_fused_edgewise_dense_fwd_and_grads(monkeypatch, use_k3):
    """Dense-gate fused kernel (eval dispatch — measured to win fwd-only,
    lose at train; see benchmarks/edgewise_train_kernel_dense.md): forward
    AND grads THROUGH the eval forward via the in-kernel VJP must match the
    composed XLA path. use_k3=True exercises the documented fallback (the
    3x3 stencil stays on the XLA path) — same equality must hold."""
    from mop_tpu import config as mcfg
    from mop_tpu.models import EdgewiseMSA

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    m = EdgewiseMSA(dim=32, heads=4, n_views=3, share_qkv=True,
                    gate_mode="dense", gate_init="and", use_k3=use_k3,
                    beta_not=0.5, attn_drop=0.0, proj_drop=0.0)
    p = m.init(jax.random.PRNGKey(1), x)
    dy = jax.random.normal(jax.random.PRNGKey(2), x.shape)

    def loss_fused(p, x):
        with pltpu.force_tpu_interpret_mode():
            y = m.apply(p, x, train=False)
        return (y * dy).sum()

    def loss_ref(p, x):
        y = m.apply(p, x, train=False)
        return (y * dy).sum()

    old_fa, old_tr = mcfg.config.fused_attention, mcfg.config.fused_edgewise_train
    try:
        mcfg.config.fused_attention = True
        mcfg.config.fused_edgewise_train = True
        monkeypatch.setattr(F, "_on_tpu", lambda: True)
        with pltpu.force_tpu_interpret_mode():
            y1 = m.apply(p, x)
        g1 = jax.grad(loss_fused, argnums=(0, 1))(p, x)
        mcfg.config.fused_attention = False
        y2 = m.apply(p, x)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    finally:
        mcfg.config.fused_attention = old_fa
        mcfg.config.fused_edgewise_train = old_tr

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=2e-4, atol=2e-5)
    flat1, _ = jax.tree_util.tree_flatten_with_path(g1)
    flat2, _ = jax.tree_util.tree_flatten_with_path(g2)
    for (path, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path))


def test_fused_quartet_matches_reference():
    rng = jax.random.PRNGKey(0)
    b, h, n, dk = 1, 2, 32, 16
    mk = lambda i: jax.random.normal(jax.random.fold_in(rng, i), (b, h, n, dk))
    q, k, v, q2, k2 = (mk(i) for i in range(5))
    m = jnp.asarray(0.3)
    qs = jnp.asarray(1.2)
    with pltpu.force_tpu_interpret_mode():
        o = F.fused_quartet_attention(q, k, v, q2, k2, m, qs, force=True)
    o_ref = F.fused_quartet_attention(q, k, v, q2, k2, m, qs, force=False)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-5)


def test_quartet_lm_consistent_with_fused_flag(monkeypatch):
    from mop_tpu import config as mcfg
    from mop_tpu.models import TransformerConfig, create_gpt_quartet

    cfg = TransformerConfig(n_layer=2, n_head=2, n_embd=32, dropout=0.0,
                            block_size=16, bias=False)
    model = create_gpt_quartet(50, cfg)
    idx = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, 50)
    p = model.init(jax.random.PRNGKey(1), idx)
    old = mcfg.config.fused_quartet
    try:
        mcfg.config.fused_quartet = False
        y_ref, _ = model.apply(p, idx)
        mcfg.config.fused_quartet = True
        monkeypatch.setattr(F, "_on_tpu", lambda: True)
        with pltpu.force_tpu_interpret_mode():
            y_fused, _ = model.apply(p, idx)
    finally:
        mcfg.config.fused_quartet = old
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_quartet_grads_match_reference():
    """The default-ON quartet kernel must be grad-safe (custom VJP that
    recomputes via the reference composition) — ADVICE r2: jax.grad over an
    eval-mode quartet forward used to crash at trace time on TPU."""
    rng = jax.random.PRNGKey(0)
    b, h, n, dk = 1, 2, 32, 16
    mk = lambda i: jax.random.normal(jax.random.fold_in(rng, i), (b, h, n, dk))
    q, k, v, q2, k2 = (mk(i) for i in range(5))
    args = (q, k, v, q2, k2, jnp.asarray(0.3), jnp.asarray(1.2))

    def loss(a, force):
        o = F.fused_quartet_attention(*a, force=force)
        return jnp.sum(o * jnp.cos(o))

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(lambda a: loss(a, True))(args)
    g_ref = jax.grad(lambda a: loss(a, False))(args)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_interpret_mode_public_override(monkeypatch):
    """config.pallas_interpret overrides the private-attribute autodetect
    (the escape hatch if a jax upgrade moves it)."""
    from mop_tpu import config as mcfg

    assert F._interpret_mode() in (False, True)
    monkeypatch.setattr(mcfg.config, "pallas_interpret", True)
    assert F._interpret_mode() is True
    monkeypatch.setattr(mcfg.config, "pallas_interpret", False)
    assert F._interpret_mode() is False
    monkeypatch.setattr(mcfg.config, "pallas_interpret", None)
    with pltpu.force_tpu_interpret_mode():
        # autodetect yields a truthy value (bool or InterpretParams —
        # pallas_call accepts either for its `interpret` argument)
        assert bool(F._interpret_mode())
