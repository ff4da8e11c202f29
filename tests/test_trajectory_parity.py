"""Trajectory-equivalence vs the torch reference (golden-fixture style).

tools/trajectory_parity.py --mode small captured: torch-initialized weights
and 30 per-step fp32 losses for A (ViT_Baseline) and B (ViT_MoP), trained
with AdamW + cosine on deterministic synthetic batches. Here we transplant
the SAME weights, replay the SAME batches in fp32, and assert the loss
trajectory agrees step-by-step — the strongest zero-egress evidence that
model math + optimizer match the reference end-to-end (retires the
"40-step accuracy gap is seed noise" question: any systematic modeling
difference diverges within a few steps).
"""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

# Tolerance grows with step: fp32 reduction-order drift compounds through
# the optimizer state. Measured headroom is ~10x below these bounds.
RTOL_EARLY, RTOL_LATE, SPLIT = 2e-4, 5e-3, 10


def _run(name):
    import jax
    import jax.numpy as jnp
    import optax

    from mop_tpu import config as mcfg
    from mop_tpu.models import ViT_Baseline, ViT_MoP
    from mop_tpu.utils.torch_port import port_torch_state_dict
    from tools.trajectory_parity import CONFIGS, LR, WD, make_batches

    cfg = CONFIGS["small"]
    data = np.load(os.path.join(GOLDEN, f"trajectory_{name}.npz"))
    torch_sd = {k[3:]: data[k] for k in data.files if k.startswith("w__")}
    golden_losses = data["out__losses"]

    x, y = make_batches(cfg["steps"], cfg["batch"])
    if name == "A":
        model = ViT_Baseline(dim=cfg["dim"], depth=cfg["depth"],
                             heads=cfg["heads"], n_classes=10, drop_path=0.0)
    else:
        model = ViT_MoP(dim=cfg["dim"], depth=cfg["depth"], heads=cfg["heads"],
                        n_classes=10, n_views=cfg["views"],
                        n_kernels=cfg["kernels"], drop_path=0.0)

    old = mcfg.config.fused_attention
    mcfg.config.fused_attention = False
    try:
        params = model.init(jax.random.PRNGKey(0), jnp.zeros(x.shape[1:]))
        params = port_torch_state_dict(torch_sd, params)
        tx = optax.adamw(optax.cosine_decay_schedule(LR, cfg["steps"]),
                         weight_decay=WD)
        opt = tx.init(params)

        @jax.jit
        def step_fn(params, opt, xb, yb):
            def lf(p):
                logits = model.apply(p, xb, train=False)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, yb).mean()
            loss, g = jax.value_and_grad(lf)(params)
            u, opt2 = tx.update(g, opt, params)
            return optax.apply_updates(params, u), opt2, loss

        losses = []
        for s in range(cfg["steps"]):
            params, opt, loss = step_fn(
                params, opt, jnp.asarray(x[s]),
                jnp.asarray(y[s].astype(np.int32)))
            losses.append(float(loss))
    finally:
        mcfg.config.fused_attention = old
    return np.asarray(losses), golden_losses


@pytest.mark.parametrize("name", ["A", "B"])
def test_lockstep_loss_trajectory_matches_torch(name):
    ours, golden = _run(name)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours[:SPLIT], golden[:SPLIT], rtol=RTOL_EARLY)
    np.testing.assert_allclose(ours[SPLIT:], golden[SPLIT:], rtol=RTOL_LATE)


def _load_golden(prefix, name):
    data = np.load(os.path.join(GOLDEN, f"{prefix}_{name}.npz"))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("w__")}
    return sd, data["out__losses"]


def _with_exact_math(fn):
    """Run fn with fused kernels off (exact composed fp32 math), restoring.

    Sets the flags itself rather than relying on the train_jax_* helpers'
    side effects, so a future helper that forgets cannot silently run the
    golden comparison through approximate kernels."""
    from mop_tpu import config as mcfg

    old = (mcfg.config.fused_attention, mcfg.config.fused_quartet,
           mcfg.config.fused_multihop, mcfg.config.fused_edgewise_train)
    mcfg.config.fused_attention = False
    mcfg.config.fused_quartet = False
    mcfg.config.fused_multihop = False
    mcfg.config.fused_edgewise_train = False
    try:
        return fn()
    finally:
        (mcfg.config.fused_attention, mcfg.config.fused_quartet,
         mcfg.config.fused_multihop, mcfg.config.fused_edgewise_train) = old


@pytest.mark.parametrize("name", ["base", "quartet", "mop"])
def test_gpt_lockstep_trajectory_matches_torch(name):
    from tools.trajectory_parity import (GPT_CONFIGS, gpt_jax_model,
                                         make_token_batches, train_jax_lm)

    cfg = GPT_CONFIGS["small"]
    sd, golden = _load_golden("trajectory_gpt", name)
    xs, ys = make_token_batches(cfg)
    ours = _with_exact_math(
        lambda: train_jax_lm(gpt_jax_model(cfg, name), sd, xs, ys))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours[:SPLIT], golden[:SPLIT], rtol=RTOL_EARLY)
    np.testing.assert_allclose(ours[SPLIT:], golden[SPLIT:], rtol=RTOL_LATE)
    assert golden[-1] < golden[0] - 0.2  # the task is actually learned


@pytest.mark.parametrize("name", ["C", "D", "E_lowrank", "E_dense"])
def test_msa_variant_lockstep_trajectory_matches_torch(name):
    """The attention-variant MODULES themselves (CrossView / MultiHop /
    Edgewise lowrank+dense) trained lockstep vs the torch reference library
    classes — pins the raw C/D/E training math (grads through the score
    algebra, gate heads, chain products) plus AdamW, independent of any
    surrounding ViT."""
    from tools.trajectory_parity import (MSA_CONFIG, make_msa_batches,
                                         msa_jax_model, train_jax_msa)

    sd, golden = _load_golden("trajectory_msa", name)
    xs, ys = make_msa_batches(MSA_CONFIG)
    ours = _with_exact_math(
        lambda: train_jax_msa(msa_jax_model(MSA_CONFIG, name), sd, xs, ys))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours[:SPLIT], golden[:SPLIT], rtol=RTOL_EARLY)
    np.testing.assert_allclose(ours[SPLIT:], golden[SPLIT:], rtol=RTOL_LATE)


@pytest.mark.parametrize("name", ["base", "mop"])
def test_whisper_lockstep_trajectory_matches_torch(name):
    from tools.trajectory_parity import (WHISPER_CONFIGS,
                                         make_whisper_batches,
                                         train_jax_whisper,
                                         whisper_jax_model)

    cfg = WHISPER_CONFIGS["small"]
    sd, golden = _load_golden("trajectory_whisper", name)
    mels, idss, ys = make_whisper_batches(cfg)
    ours = _with_exact_math(
        lambda: train_jax_whisper(whisper_jax_model(cfg, name), sd,
                                  mels, idss, ys))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours[:SPLIT], golden[:SPLIT], rtol=RTOL_EARLY)
    np.testing.assert_allclose(ours[SPLIT:], golden[SPLIT:], rtol=RTOL_LATE)
    assert golden[-1] < golden[0] - 0.1
