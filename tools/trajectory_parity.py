"""Trajectory-equivalence parity: torch reference vs mop-tpu, lockstep.

The strongest accuracy evidence available in a zero-egress environment:
initialize BOTH frameworks from the SAME weights (torch init, transplanted
via ``mop_tpu.utils.torch_port``), train fp32 on IDENTICAL synthetic batches
with identical AdamW + cosine schedule, and compare per-step losses. If the
math is equivalent, the loss curves agree to float tolerance; any modeling
or optimizer mismatch diverges within a few steps.

Modes:
  --mode 5m     (default) benchmark-scale configs, 50 steps fp32;
                writes benchmarks/trajectory_parity[_<family>].csv
  --mode small  tiny configs, 30 steps; writes tests/golden/trajectory_*.npz
                (torch init weights + per-step torch losses) consumed by
                tests/test_trajectory_parity.py

Families:
  --family vit      (default) A = ViT_Baseline, B = ViT_MoP
  --family gpt      base / quartet / mop (TinyTransformerLM + GPT_MoP)
  --family whisper  base (zeroed alphas) / mop (WhisperMoP)
  --family msa      the attention-variant modules themselves: C (CrossView),
                    D (MultiHop), E lowrank + E dense — trained lockstep on a
                    regression task, pinning the raw variant math + grads
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = os.environ.get("MOP_REFERENCE", "/root/reference")

MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32).reshape(1, 3, 1, 1)
STD = np.array([0.2470, 0.2435, 0.2616], np.float32).reshape(1, 3, 1, 1)

CONFIGS = {
    "5m": dict(dim=224, depth=6, heads=4, views=5, kernels=3,
               steps=50, batch=64),
    "small": dict(dim=64, depth=2, heads=4, views=3, kernels=2,
                  steps=30, batch=32),
}
GPT_CONFIGS = {
    # ~5M-param class LM config (n_embd=192, L=6); vocab kept small so the
    # tied embedding doesn't dominate and CE stays informative.
    "5m": dict(n_layer=6, n_head=4, n_embd=192, block_size=64, vocab=512,
               steps=50, batch=32),
    "small": dict(n_layer=2, n_head=4, n_embd=64, block_size=32, vocab=128,
                  steps=30, batch=16),
}
WHISPER_CONFIGS = {
    "5m": dict(n_embd=192, n_head=4, n_layer_enc=3, n_layer_dec=3, n_mels=80,
               t_audio=100, t_text=32, vocab=512, steps=50, batch=8),
    "small": dict(n_embd=64, n_head=4, n_layer_enc=2, n_layer_dec=2,
                  n_mels=40, t_audio=50, t_text=16, vocab=128,
                  steps=30, batch=4),
}
LR, WD = 1e-3, 5e-2


def make_batches(steps, batch, seed=0):
    from mop_tpu.data import synthetic_cifar

    tr_x, tr_y, _, _ = synthetic_cifar("cifar10", steps * batch, 8, seed=seed)
    x = ((tr_x.astype(np.float32) / 255.0 - MEAN) / STD).reshape(
        steps, batch, 3, 32, 32)
    y = tr_y.reshape(steps, batch).astype(np.int64)
    return x, y


def torch_models(cfg, seed=0):
    import torch

    sys.path.insert(0, REF)
    from mop.models import ViT_Baseline as TA, ViT_MoP as TB

    torch.manual_seed(seed)
    a = TA(dim=cfg["dim"], depth=cfg["depth"], heads=cfg["heads"],
           n_classes=10, drop_path=0.0)
    b = TB(dim=cfg["dim"], depth=cfg["depth"], heads=cfg["heads"],
           n_classes=10, n_views=cfg["views"], n_kernels=cfg["kernels"],
           drop_path=0.0)
    return {"A": a, "B": b}


def train_torch(model, x, y):
    """Per-step fp32 losses. model.eval(): deterministic forward (drop_path=0,
    no dropout) — grads still flow; matches the jax side's train=False."""
    import torch

    model.eval()
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=x.shape[0])
    losses = []
    for s in range(x.shape[0]):
        xb = torch.from_numpy(x[s])
        yb = torch.from_numpy(y[s])
        opt.zero_grad(set_to_none=True)
        loss = torch.nn.functional.cross_entropy(model(xb), yb)
        loss.backward()
        opt.step()
        sch.step()
        losses.append(float(loss.item()))
    return np.asarray(losses, np.float64)


def jax_model(cfg, name):
    from mop_tpu.models import ViT_Baseline, ViT_MoP

    if name == "A":
        return ViT_Baseline(dim=cfg["dim"], depth=cfg["depth"],
                            heads=cfg["heads"], n_classes=10, drop_path=0.0)
    return ViT_MoP(dim=cfg["dim"], depth=cfg["depth"], heads=cfg["heads"],
                   n_classes=10, n_views=cfg["views"],
                   n_kernels=cfg["kernels"], drop_path=0.0)


def train_jax(model, torch_sd, x, y):
    import jax
    import jax.numpy as jnp
    import optax

    from mop_tpu import config as mcfg
    from mop_tpu.utils.torch_port import port_torch_state_dict

    mcfg.config.fused_attention = False  # exact composed math, fp32
    steps = x.shape[0]
    params = model.init(jax.random.PRNGKey(0), jnp.zeros(x.shape[1:]))
    params = port_torch_state_dict(torch_sd, params)
    tx = optax.adamw(optax.cosine_decay_schedule(LR, steps), weight_decay=WD)
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
    for s in range(steps):
        params, opt, loss = step_fn(params, opt, jnp.asarray(x[s]),
                                    jnp.asarray(y[s].astype(np.int32)))
        losses.append(float(loss))
    return np.asarray(losses, np.float64)


# ----------------------------- GPT family -----------------------------


def make_token_batches(cfg, seed=0):
    """(steps, B, T) input ids + next-token targets.

    Sequences are noisy arithmetic progressions mod vocab (stride 1..5 per
    sample, 10% corruption), so next-token prediction is LEARNABLE and the
    lockstep comparison exercises real learning dynamics, not just noise
    gradients around ln(vocab)."""
    rs = np.random.RandomState(seed)
    s, b, t, v = cfg["steps"], cfg["batch"], cfg["block_size"], cfg["vocab"]
    start = rs.randint(0, v, (s, b, 1))
    stride = rs.randint(1, 6, (s, b, 1))
    idx = (start + stride * np.arange(t + 1)) % v
    corrupt = rs.rand(s, b, t + 1) < 0.10
    idx = np.where(corrupt, rs.randint(0, v, (s, b, t + 1)), idx)
    return idx[..., :-1].astype(np.int64), idx[..., 1:].astype(np.int64)


def gpt_torch_models(cfg, seed=0):
    import torch

    sys.path.insert(0, REF)
    from mop.models import (create_gpt_baseline, create_gpt_mop,
                            create_gpt_quartet)
    from mop.models.quartet_attn_patch import TransformerConfig

    tc = TransformerConfig(n_layer=cfg["n_layer"], n_head=cfg["n_head"],
                           n_embd=cfg["n_embd"], dropout=0.0,
                           block_size=cfg["block_size"])
    out = {}
    for name, fac in (("base", create_gpt_baseline),
                      ("quartet", create_gpt_quartet),
                      ("mop", create_gpt_mop)):
        torch.manual_seed(seed)
        out[name] = fac(cfg["vocab"], tc)
    return out


def gpt_jax_model(cfg, name):
    from mop_tpu.models import (TransformerConfig, create_gpt_baseline,
                                create_gpt_mop, create_gpt_quartet)

    tc = TransformerConfig(n_layer=cfg["n_layer"], n_head=cfg["n_head"],
                           n_embd=cfg["n_embd"], dropout=0.0,
                           block_size=cfg["block_size"])
    fac = {"base": create_gpt_baseline, "quartet": create_gpt_quartet,
           "mop": create_gpt_mop}[name]
    return fac(cfg["vocab"], tc)


def train_torch_lm(model, xs, ys):
    """Per-step fp32 losses; model(idx, targets=...) -> (logits, loss)."""
    import torch

    model.eval()
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=xs.shape[0])
    losses = []
    for s in range(xs.shape[0]):
        opt.zero_grad(set_to_none=True)
        _, loss = model(torch.from_numpy(xs[s]),
                        targets=torch.from_numpy(ys[s]))
        loss.backward()
        opt.step()
        sch.step()
        losses.append(float(loss.item()))
    return np.asarray(losses, np.float64)


def train_jax_lm(model, torch_sd, xs, ys):
    import jax
    import jax.numpy as jnp
    import optax

    from mop_tpu import config as mcfg
    from mop_tpu.utils.torch_port import port_torch_state_dict

    mcfg.config.fused_attention = False
    mcfg.config.fused_quartet = False
    steps = xs.shape[0]
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(xs[0].astype(np.int32)))
    params = port_torch_state_dict(torch_sd, params)
    tx = optax.adamw(optax.cosine_decay_schedule(LR, steps), weight_decay=WD)
    opt = tx.init(params)

    @jax.jit
    def step_fn(params, opt, xb, yb):
        def lf(p):
            _, loss = model.apply(p, xb, targets=yb, train=False)
            return loss
        loss, g = jax.value_and_grad(lf)(params)
        u, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt2, loss

    losses = []
    for s in range(steps):
        params, opt, loss = step_fn(
            params, opt, jnp.asarray(xs[s].astype(np.int32)),
            jnp.asarray(ys[s].astype(np.int32)))
        losses.append(float(loss))
    return np.asarray(losses, np.float64)


# --------------------------- Whisper family ---------------------------


def make_whisper_batches(cfg, seed=0):
    """(mel, dec ids, targets) per step.

    Decoder ids are noisy arithmetic progressions (learnable next-token task,
    see make_token_batches); the mel carries a stripe pattern whose frequency
    encodes the sample's stride so cross-attention has signal to use."""
    rs = np.random.RandomState(seed)
    s, b, tt, v = cfg["steps"], cfg["batch"], cfg["t_text"], cfg["vocab"]
    start = rs.randint(0, v, (s, b, 1))
    stride = rs.randint(1, 6, (s, b, 1))
    ids = (start + stride * np.arange(tt + 1)) % v
    corrupt = rs.rand(s, b, tt + 1) < 0.10
    ids = np.where(corrupt, rs.randint(0, v, (s, b, tt + 1)), ids)
    ta, f = cfg["t_audio"], cfg["n_mels"]
    phase = np.arange(ta)[None, None, :, None] * stride[..., None]
    mel = (np.sin(2 * np.pi * phase / 16.0)
           * np.ones((1, 1, 1, f))).astype(np.float32)
    mel += rs.randn(s, b, ta, f).astype(np.float32) * 0.3
    return mel, ids[..., :-1].astype(np.int64), ids[..., 1:].astype(np.int64)


def whisper_cfgs(cfg):
    kw = dict(n_mels=cfg["n_mels"], n_audio_ctx=cfg["t_audio"],
              vocab_size=cfg["vocab"], n_text_ctx=cfg["t_text"],
              n_embd=cfg["n_embd"], n_head=cfg["n_head"],
              n_layer_enc=cfg["n_layer_enc"], n_layer_dec=cfg["n_layer_dec"],
              dropout=0.0)
    return kw


def whisper_torch_models(cfg, seed=0):
    import torch

    sys.path.insert(0, REF)
    from mop.models import (WhisperConfig, create_whisper_baseline,
                            create_whisper_mop)

    wc = WhisperConfig(**whisper_cfgs(cfg))
    out = {}
    for name, fac in (("base", create_whisper_baseline),
                      ("mop", create_whisper_mop)):
        torch.manual_seed(seed)
        out[name] = fac(wc)
    return out


def whisper_jax_model(cfg, name):
    from mop_tpu.models import (WhisperConfig, create_whisper_baseline,
                                create_whisper_mop)

    wc = WhisperConfig(**whisper_cfgs(cfg))
    fac = {"base": create_whisper_baseline, "mop": create_whisper_mop}[name]
    return fac(wc)


def train_torch_whisper(model, mels, idss, ys):
    import torch

    model.eval()
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=mels.shape[0])
    losses = []
    for s in range(mels.shape[0]):
        opt.zero_grad(set_to_none=True)
        _, loss, _ = model(torch.from_numpy(mels[s]),
                           torch.from_numpy(idss[s]),
                           targets=torch.from_numpy(ys[s]))
        loss.backward()
        opt.step()
        sch.step()
        losses.append(float(loss.item()))
    return np.asarray(losses, np.float64)


def train_jax_whisper(model, torch_sd, mels, idss, ys):
    import jax
    import jax.numpy as jnp
    import optax

    from mop_tpu import config as mcfg
    from mop_tpu.utils.torch_port import port_torch_state_dict

    mcfg.config.fused_attention = False
    steps = mels.shape[0]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(mels[0]),
                        jnp.asarray(idss[0].astype(np.int32)))
    params = port_torch_state_dict(torch_sd, params)
    tx = optax.adamw(optax.cosine_decay_schedule(LR, steps), weight_decay=WD)
    opt = tx.init(params)

    @jax.jit
    def step_fn(params, opt, mb, ib, yb):
        def lf(p):
            _, loss, _ = model.apply(p, mb, ib, targets=yb, train=False)
            return loss
        loss, g = jax.value_and_grad(lf)(params)
        u, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt2, loss

    losses = []
    for s in range(steps):
        params, opt, loss = step_fn(
            params, opt, jnp.asarray(mels[s]),
            jnp.asarray(idss[s].astype(np.int32)),
            jnp.asarray(ys[s].astype(np.int32)))
        losses.append(float(loss))
    return np.asarray(losses, np.float64)


# ------------------------- MSA variant modules -------------------------

MSA_CONFIG = dict(dim=32, heads=4, batch=8, n_tokens=16, steps=30)

MSA_KWARGS = {
    # fixed anchor: argmax_row_sum tie-breaks on float noise cross-framework
    "C": dict(use_transpose_cues=True, t1=0.1, t2=0.2,
              enable_per_key_prior=True, prior_weight=0.3,
              anchor_mode="fixed", fixed_k_star=1),
    "D": dict(beta_not=0.5,
              gates=dict(base=1.0, and_=0.7, or_=0.3, not_=0.2, chain=0.4),
              hops=2),
    "E_lowrank": dict(n_views=3, share_qkv=True, gate_mode="lowrank",
                      gate_rank=2, gate_init="mix5", beta_not=0.5),
    "E_dense": dict(n_views=3, use_k3=True, gate_mode="dense",
                    gate_init="and", beta_not=0.5),
}


def make_msa_batches(cfg, seed=0):
    rs = np.random.RandomState(seed)
    s, b, n, d = cfg["steps"], cfg["batch"], cfg["n_tokens"], cfg["dim"]
    x = rs.randn(s, b, n, d).astype(np.float32) * 0.5
    # Learnable target: a mild fixed linear map plus the token-mean (an
    # attention module reaches both easily, so the loss actually falls and
    # the lockstep comparison exercises real learning dynamics).
    w = (np.eye(d) * 0.3 + rs.randn(d, d) * 0.05).astype(np.float32)
    y = x @ w + 0.2 * x.mean(axis=2, keepdims=True)
    return x, y


def _msa_gate_kwargs(name, kw):
    """The reference's MultiHop gate dict uses keys base/and_/or_/not_/chain
    on BOTH sides (same naming), so kwargs pass through unchanged."""
    return dict(kw)


def msa_torch_models(cfg, seed=0):
    import torch

    sys.path.insert(0, REF)
    from mop.models.attention_variants import (CrossViewMixerMSA, EdgewiseMSA,
                                               MultiHopMSA)

    classes = {"C": CrossViewMixerMSA, "D": MultiHopMSA,
               "E_lowrank": EdgewiseMSA, "E_dense": EdgewiseMSA}
    out = {}
    for name, cls in classes.items():
        torch.manual_seed(seed)
        out[name] = cls(dim=cfg["dim"], heads=cfg["heads"],
                        **_msa_gate_kwargs(name, MSA_KWARGS[name]))
    return out


def msa_jax_model(cfg, name):
    from mop_tpu.models import CrossViewMixerMSA, EdgewiseMSA, MultiHopMSA

    classes = {"C": CrossViewMixerMSA, "D": MultiHopMSA,
               "E_lowrank": EdgewiseMSA, "E_dense": EdgewiseMSA}
    return classes[name](dim=cfg["dim"], heads=cfg["heads"],
                         **_msa_gate_kwargs(name, MSA_KWARGS[name]))


def train_torch_msa(model, xs, ys):
    import torch

    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=xs.shape[0])
    losses = []
    for s in range(xs.shape[0]):
        opt.zero_grad(set_to_none=True)
        out = model(torch.from_numpy(xs[s]))
        loss = torch.nn.functional.mse_loss(out, torch.from_numpy(ys[s]))
        loss.backward()
        opt.step()
        sch.step()
        losses.append(float(loss.item()))
    return np.asarray(losses, np.float64)


def train_jax_msa(model, torch_sd, xs, ys):
    import jax
    import jax.numpy as jnp
    import optax

    from mop_tpu import config as mcfg
    from mop_tpu.utils.torch_port import port_torch_state_dict

    mcfg.config.fused_attention = False
    steps = xs.shape[0]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(xs[0]))
    params = port_torch_state_dict(torch_sd, params)
    tx = optax.adamw(optax.cosine_decay_schedule(LR, steps), weight_decay=WD)
    opt = tx.init(params)

    @jax.jit
    def step_fn(params, opt, xb, yb):
        def lf(p):
            out = model.apply(p, xb, train=True,
                              rngs={"dropout": jax.random.PRNGKey(0)})
            return jnp.mean(jnp.square(out - yb))
        loss, g = jax.value_and_grad(lf)(params)
        u, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt2, loss

    losses = []
    for s in range(steps):
        params, opt, loss = step_fn(params, opt, jnp.asarray(xs[s]),
                                    jnp.asarray(ys[s]))
        losses.append(float(loss))
    return np.asarray(losses, np.float64)


# ------------------------------- driver -------------------------------


def _snapshot_sd(tm):
    # .copy(): numpy() views torch storage, which the in-place optimizer
    # updates would mutate before we save/transplant.
    return {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("5m", "small"), default="5m")
    ap.add_argument("--family", choices=("vit", "gpt", "whisper", "msa"),
                    default="vit")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # fp32 determinism; no TPU needed

    if args.family == "vit":
        cfg = CONFIGS[args.mode]
        x, y = make_batches(cfg["steps"], cfg["batch"])
        tms = torch_models(cfg)
        run_torch = lambda tm: train_torch(tm, x, y)  # noqa: E731
        run_jax = lambda name, sd: train_jax(  # noqa: E731
            jax_model(cfg, name), sd, x, y)
        golden_prefix, csv_suffix = "trajectory", ""
    elif args.family == "gpt":
        cfg = GPT_CONFIGS[args.mode]
        xs, ys = make_token_batches(cfg)
        tms = gpt_torch_models(cfg)
        run_torch = lambda tm: train_torch_lm(tm, xs, ys)  # noqa: E731
        run_jax = lambda name, sd: train_jax_lm(  # noqa: E731
            gpt_jax_model(cfg, name), sd, xs, ys)
        golden_prefix, csv_suffix = "trajectory_gpt", "_gpt"
    elif args.family == "whisper":
        cfg = WHISPER_CONFIGS[args.mode]
        mels, idss, ys = make_whisper_batches(cfg)
        tms = whisper_torch_models(cfg)
        run_torch = lambda tm: train_torch_whisper(tm, mels, idss, ys)  # noqa: E731
        run_jax = lambda name, sd: train_jax_whisper(  # noqa: E731
            whisper_jax_model(cfg, name), sd, mels, idss, ys)
        golden_prefix, csv_suffix = "trajectory_whisper", "_whisper"
    else:
        cfg = MSA_CONFIG  # one size; --mode only picks golden vs csv output
        xs, ys = make_msa_batches(cfg)
        tms = msa_torch_models(cfg)
        run_torch = lambda tm: train_torch_msa(tm, xs, ys)  # noqa: E731
        run_jax = lambda name, sd: train_jax_msa(  # noqa: E731
            msa_jax_model(cfg, name), sd, xs, ys)
        golden_prefix, csv_suffix = "trajectory_msa", "_msa"

    if args.mode == "small":
        os.makedirs(os.path.join(REPO, "tests", "golden"), exist_ok=True)
        for name, tm in tms.items():
            sd = _snapshot_sd(tm)
            losses = run_torch(tm)
            out = {f"w__{k}": v for k, v in sd.items()}
            out["out__losses"] = losses
            path = os.path.join(REPO, "tests", "golden",
                                f"{golden_prefix}_{name}.npz")
            np.savez_compressed(path, **out)
            print(f"{name}: wrote {path} ({losses[0]:.4f} -> {losses[-1]:.4f})")
        return

    rows = []
    for name, tm in tms.items():
        sd = _snapshot_sd(tm)
        print(f"[{name}] torch {cfg['steps']}-step fp32 run...", flush=True)
        lt = run_torch(tm)
        print(f"[{name}] jax lockstep run...", flush=True)
        lj = run_jax(name, sd)
        rel = np.abs(lt - lj) / np.maximum(np.abs(lt), 1e-9)
        for s in range(cfg["steps"]):
            rows.append((name, s, lt[s], lj[s], rel[s]))
        print(f"[{name}] max rel loss diff over {cfg['steps']} steps: "
              f"{rel.max():.2e} (final torch {lt[-1]:.4f} vs jax {lj[-1]:.4f})")

    path = os.path.join(REPO, "benchmarks",
                        f"trajectory_parity{csv_suffix}.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["model", "step", "loss_torch", "loss_jax", "rel_diff"])
        for r in rows:
            w.writerow([r[0], r[1], f"{r[2]:.6f}", f"{r[3]:.6f}", f"{r[4]:.2e}"])
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
