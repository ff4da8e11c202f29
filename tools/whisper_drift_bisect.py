"""Bisect the Whisper-MoP trajectory-parity drift (VERDICT r2 weak #3).

Whisper-MoP's 50-step lockstep drift vs torch is ~3.7e-3 max relative while
whisper-base (same arch, fuse.alpha zeroed so gate==1) sits at 1.6e-5 — so
the divergence enters through the mel-gate (MoP2D) path. This tool isolates
WHERE:

1. Transplant the torch init into the flax model and compare the step-0
   forward (loss, per-layer gates) — a math mismatch shows up here.
2. Compare step-0 GRADS per parameter: torch autograd grads are ported
   through the same ``port_torch_state_dict`` layout machinery (grads have
   the parameters' shapes) and diffed leaf-by-leaf against ``jax.grad``,
   grouped by submodule. A localized math/layout bug shows up as one
   submodule with outsized error; uniform ~1e-6 noise that is AMPLIFIED in
   the MoP2D convs indicates reduction-order compounding (torch im2col GEMM
   vs XLA's conv lowering reassociate differently).
3. Freeze the MoP2D parameters in BOTH frameworks (zero their grads each
   step) and rerun the 50-step lockstep: if drift collapses to the
   whisper-base class, the compounding is confined to the gate-path convs.

Run:  python tools/whisper_drift_bisect.py [--steps 50] [--freeze]
Writes benchmarks/whisper_drift_bisect.md with the table + verdict.
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = os.environ.get("MOP_REFERENCE", "/root/reference")

LR, WD = 1e-3, 5e-2  # identical to tools/trajectory_parity.py


def build(cfg_name="5m"):
    import torch

    sys.path.insert(0, REF)
    from mop.models import WhisperConfig as TorchWC
    from mop.models import create_whisper_mop as torch_mop

    from tools.trajectory_parity import (WHISPER_CONFIGS,
                                         make_whisper_batches, whisper_cfgs)

    cfg = WHISPER_CONFIGS[cfg_name]
    torch.manual_seed(0)
    tm = torch_mop(TorchWC(**whisper_cfgs(cfg)))
    tm.eval()

    from mop_tpu.models import WhisperConfig, create_whisper_mop

    jm = create_whisper_mop(WhisperConfig(**whisper_cfgs(cfg)))
    mels, idss, ys = make_whisper_batches(cfg)
    return cfg, tm, jm, mels, idss, ys


def transplant(tm, jm, mels, idss):
    import jax
    import jax.numpy as jnp

    from mop_tpu.utils.torch_port import port_torch_state_dict

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jm.init(jax.random.PRNGKey(0), jnp.asarray(mels[0]),
                     jnp.asarray(idss[0].astype(np.int32)))
    return port_torch_state_dict(sd, params), sd


def torch_loss_and_grads(tm, mel, ids, y):
    import torch

    tm.zero_grad(set_to_none=True)
    _, loss, gates = tm(torch.from_numpy(mel), torch.from_numpy(ids),
                        targets=torch.from_numpy(y))
    loss.backward()
    grads = {k: (p.grad.detach().numpy() if p.grad is not None
                 else np.zeros_like(p.detach().numpy()))
             for k, p in tm.named_parameters()}
    return float(loss.item()), gates.detach().numpy(), grads


def jax_loss_and_grads(jm, params, mel, ids, y):
    import jax
    import jax.numpy as jnp

    from mop_tpu import config as mcfg

    mcfg.config.fused_attention = False

    def lf(p):
        _, loss, gates = jm.apply(p, jnp.asarray(mel),
                                  jnp.asarray(ids.astype(np.int32)),
                                  targets=jnp.asarray(y.astype(np.int32)),
                                  train=False)
        return loss, gates

    (loss, gates), g = jax.value_and_grad(lf, has_aux=True)(params)
    return float(loss), np.asarray(gates), g


def grad_table(tm, jm, params, sd, mels, idss, ys):
    """Per-submodule grad comparison at step 0."""
    import flax

    from mop_tpu.utils.torch_port import port_torch_state_dict

    tl, tgates, tgrads = torch_loss_and_grads(tm, mels[0], idss[0], ys[0])
    jl, jgates, jg = jax_loss_and_grads(jm, params, mels[0], idss[0], ys[0])
    print(f"step-0 loss: torch {tl:.8f} jax {jl:.8f} "
          f"|diff| {abs(tl - jl):.2e}")
    gd = np.max(np.abs(tgates - jgates)) / max(1e-9,
                                               float(np.max(np.abs(tgates))))
    print(f"step-0 gates max-rel diff: {gd:.2e}")

    # Port torch grads through the same layout machinery (same shapes).
    ported = port_torch_state_dict(tgrads, params)
    fj = dict(flax.traverse_util.flatten_dict(jg["params"]))
    fp = dict(flax.traverse_util.flatten_dict(ported["params"]))
    groups = defaultdict(lambda: [0.0, 0.0])  # max abs, max scale-rel
    rows = []
    for path in fj:
        a, b = np.asarray(fj[path], np.float64), np.asarray(fp[path],
                                                            np.float64)
        abs_e = float(np.max(np.abs(a - b)))
        scale = max(float(np.max(np.abs(b))), 1e-12)
        rel_e = abs_e / scale
        # group by the meaningful submodule: encoder_i/{sa,mlp,mop,...}
        parts = path[:-1]
        if len(parts) >= 2 and parts[0].startswith(("encoder", "decoder")):
            key = f"{parts[0]}/{parts[1]}"
        else:
            key = parts[0] if parts else "root"
        groups[key][0] = max(groups[key][0], abs_e)
        groups[key][1] = max(groups[key][1], rel_e)
        rows.append(("/".join(path), abs_e, rel_e))
    return tl, jl, gd, dict(groups), rows


def lockstep(tm, jm, params, mels, idss, ys, steps, freeze_mop):
    """Lockstep AdamW training in both frameworks; returns per-step losses.

    freeze_mop: zero the MoP2D (views/kerns/fuse) grads in BOTH frameworks
    each step — isolates whether gate-path grad noise drives the drift."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from mop_tpu import config as mcfg

    mcfg.config.fused_attention = False

    def is_mop_param(name):
        # torch: encoder.N.mop.{views,kernels,fuse}...; jax mirrors the names
        return any(t in name for t in ("views", "kernels", "kerns", "fuse"))

    opt = torch.optim.AdamW(tm.parameters(), lr=LR, weight_decay=WD)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=steps)
    tx = optax.adamw(optax.cosine_decay_schedule(LR, steps), weight_decay=WD)
    jopt = tx.init(params)

    @jax.jit
    def jstep(p, o, mb, ib, yb):
        def lf(p):
            _, loss, _ = jm.apply(p, mb, ib, targets=yb, train=False)
            return loss

        loss, g = jax.value_and_grad(lf)(p)
        if freeze_mop:
            import flax

            fg = dict(flax.traverse_util.flatten_dict(g["params"]))
            for path in fg:
                if any(is_mop_param(s) for s in path):
                    fg[path] = jnp.zeros_like(fg[path])
            g = {"params": flax.traverse_util.unflatten_dict(fg)}
        u, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, u), o2, loss

    t_losses, j_losses = [], []
    for s in range(steps):
        opt.zero_grad(set_to_none=True)
        _, loss, _ = tm(torch.from_numpy(mels[s]), torch.from_numpy(idss[s]),
                        targets=torch.from_numpy(ys[s]))
        loss.backward()
        if freeze_mop:
            for name, p in tm.named_parameters():
                if is_mop_param(name) and p.grad is not None:
                    p.grad.zero_()
        opt.step()
        sch.step()
        t_losses.append(float(loss.item()))

        params, jopt, jl = jstep(params, jopt,
                                 jnp.asarray(mels[s]),
                                 jnp.asarray(idss[s].astype(np.int32)),
                                 jnp.asarray(ys[s].astype(np.int32)))
        j_losses.append(float(jl))
    return np.asarray(t_losses), np.asarray(j_losses)


def torch_chaos_control(cfg_name, steps, eps):
    """torch-vs-torch Lyapunov control: train the SAME torch model twice,
    the second with relative noise ``eps`` injected into the MoP conv
    weights at init. The resulting loss drift is what pure float-level
    perturbation grows to under this optimizer/schedule — the yardstick
    against which the cross-framework drift must be read."""
    import torch

    def run(perturb):
        cfg, tm, _, mels, idss, ys = build(cfg_name)
        if perturb:
            n_hit = 0
            with torch.no_grad():
                for name, p in tm.named_parameters():
                    if ("kernels" in name or "kerns" in name) and \
                            name.endswith("weight"):
                        p.mul_(1.0 + eps)
                        n_hit += 1
            assert n_hit > 0, "perturbation matched no parameters"
        opt = torch.optim.AdamW(tm.parameters(), lr=LR, weight_decay=WD)
        sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=steps)
        losses = []
        for s in range(steps):
            opt.zero_grad(set_to_none=True)
            _, loss, _ = tm(torch.from_numpy(mels[s]),
                            torch.from_numpy(idss[s]),
                            targets=torch.from_numpy(ys[s]))
            loss.backward()
            opt.step()
            sch.step()
            losses.append(float(loss.item()))
        return np.asarray(losses)

    a, b = run(False), run(True)
    return np.max(np.abs(a - b) / np.maximum(np.abs(a), 1e-9))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg", default="5m")
    ap.add_argument("--no_freeze_run", action="store_true")
    ap.add_argument("--chaos_eps", type=float, default=1e-6)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    cfg, tm, jm, mels, idss, ys = build(args.cfg)
    params, sd = transplant(tm, jm, mels, idss)

    print("== step-0 forward + grad bisect ==")
    tl, jl, gate_diff, groups, rows = grad_table(
        tm, jm, params, sd, mels, idss, ys)
    print(f"{'submodule':34s} {'max|dg|':>10s} {'max rel':>10s}")
    for k in sorted(groups, key=lambda k: -groups[k][1]):
        print(f"{k:34s} {groups[k][0]:10.2e} {groups[k][1]:10.2e}")
    worst = sorted(rows, key=lambda r: -r[2])[:8]
    print("\nworst leaves:")
    for name, a, r in worst:
        print(f"  {name}: abs {a:.2e} rel {r:.2e}")

    results = {}
    for freeze in ([False, True] if not args.no_freeze_run else [False]):
        t_l, j_l = lockstep(build(args.cfg)[1],
                            jm, params, mels, idss, ys, args.steps, freeze)
        rel = np.max(np.abs(t_l - j_l) / np.maximum(np.abs(t_l), 1e-9))
        results[freeze] = (t_l, j_l, rel)
        print(f"\nlockstep {args.steps} steps freeze_mop={freeze}: "
              f"max rel loss drift {rel:.2e}")

    chaos = torch_chaos_control(args.cfg, args.steps, args.chaos_eps)
    print(f"torch-vs-torch chaos control (eps={args.chaos_eps:g} on MoP "
          f"convs): max rel loss drift {chaos:.2e}")

    out = os.path.join(REPO, "benchmarks", "whisper_drift_bisect.md")
    with open(out, "w") as f:
        f.write("# Whisper-MoP trajectory-drift bisect\n\n")
        f.write(f"Config `{args.cfg}`, {args.steps} lockstep fp32 steps, "
                "CPU highest matmul precision.\n\n")
        f.write(f"- step-0 loss diff: {abs(tl - jl):.2e}\n")
        f.write(f"- step-0 gate max-rel diff: {gate_diff:.2e}\n\n")
        f.write("| submodule | max abs grad diff | max scale-rel |\n")
        f.write("|---|---|---|\n")
        for k in sorted(groups, key=lambda k: -groups[k][1]):
            f.write(f"| {k} | {groups[k][0]:.2e} | {groups[k][1]:.2e} |\n")
        f.write("\n")
        for freeze, (t_l, j_l, rel) in results.items():
            f.write(f"- lockstep max rel loss drift (freeze_mop={freeze}): "
                    f"{rel:.2e}\n")
        f.write(f"- torch-vs-torch chaos control "
                f"(eps={args.chaos_eps:g} on MoP convs): {chaos:.2e}\n")
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
