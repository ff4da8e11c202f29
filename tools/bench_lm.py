"""Throughput benchmarks for the GPT and Whisper families (train step).

Same methodology as bench.py: full train step (bf16 fwd/bwd + AdamW) on the
mesh, min-of-3 timed windows, host-transfer barrier (block_until_ready is a
no-op on the axon backend). The torch baseline runs the reference model
as-is on this host's CPU (its only runnable backend here) and is cached.

Writes benchmarks/lm_throughput.md and prints one JSON line per family.

Usage: python tools/bench_lm.py [--family gpt|whisper|all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = os.environ.get("MOP_REFERENCE", "/root/reference")
CACHE = os.path.join(REPO, "bench_lm_baseline.json")

GPT = dict(n_layer=6, n_head=6, n_embd=384, block_size=256, vocab=8192,
           batch=64)
WHISPER = dict(n_embd=384, n_head=6, n_layer_enc=4, n_layer_dec=4, n_mels=80,
               t_audio=750, t_text=112, vocab=8192, batch=8)
WINDOWS, STEPS_PER_WINDOW = 3, 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _time_windows(run_one, barrier):
    for _ in range(3):
        run_one()
    barrier()
    times = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(STEPS_PER_WINDOW):
            run_one()
        barrier()
        times.append((time.perf_counter() - t0) / STEPS_PER_WINDOW)
    return min(times), times


def bench_gpt_ours():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mop_tpu.models import TransformerConfig, create_gpt_mop
    from mop_tpu.parallel import (make_lm_train_step, make_mesh, replicate,
                                  shard_batch)

    c = GPT
    cfg = TransformerConfig(n_layer=c["n_layer"], n_head=c["n_head"],
                            n_embd=c["n_embd"], dropout=0.0,
                            block_size=c["block_size"])
    model = create_gpt_mop(c["vocab"], cfg)
    mesh = make_mesh()
    n_chips = len(list(mesh.devices.flat))
    b = c["batch"] * n_chips
    rng = jax.random.PRNGKey(0)
    idx = np.random.RandomState(0).randint(
        0, c["vocab"], (b, c["block_size"])).astype(np.int32)
    tgt = np.roll(idx, -1, axis=-1)
    from mop_tpu.utils import jitted_init
    params = jitted_init(model, rng, jnp.asarray(idx[:2]))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    tx = optax.adamw(3e-4, weight_decay=0.1)
    opt = tx.init(params)
    state = {}
    with mesh:
        p = replicate(params, mesh)
        o = replicate(opt, mesh)
        ib, tb = shard_batch((idx, tgt), mesh)
        step = make_lm_train_step(model, tx, mesh)
        state.update(p=p, o=o, m=None, i=0)

        def run_one():
            state["i"] += 1
            state["p"], state["o"], state["m"] = step(
                state["p"], state["o"], ib, tb,
                jax.random.fold_in(rng, state["i"]))

        def barrier():
            float(state["m"]["loss"])

        best, all_t = _time_windows(run_one, barrier)
    toks = b * c["block_size"] / best / n_chips
    log(f"gpt ours: {best * 1e3:.2f} ms/step "
        f"(all {['%.1f' % (t * 1e3) for t in all_t]}), {toks:,.0f} tok/s/chip, "
        f"params {n_params:,}")
    return dict(ms_per_step=round(best * 1e3, 2),
                tokens_per_sec_per_chip=round(toks, 1), params=n_params,
                batch=b, seq=c["block_size"], n_chips=n_chips)


def bench_whisper_ours():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mop_tpu.models import WhisperConfig, create_whisper_mop
    from mop_tpu.parallel import make_mesh, replicate, shard_batch
    from mop_tpu.parallel.train_step import cast_floats

    c = WHISPER
    cfg = WhisperConfig(n_mels=c["n_mels"], n_audio_ctx=c["t_audio"],
                        vocab_size=c["vocab"], n_text_ctx=c["t_text"],
                        n_embd=c["n_embd"], n_head=c["n_head"],
                        n_layer_enc=c["n_layer_enc"],
                        n_layer_dec=c["n_layer_dec"], dropout=0.0)
    model = create_whisper_mop(cfg)
    mesh = make_mesh()
    n_chips = len(list(mesh.devices.flat))
    b = c["batch"] * n_chips
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    mel = rs.randn(b, c["t_audio"], c["n_mels"]).astype(np.float32)
    ids = rs.randint(0, c["vocab"], (b, c["t_text"])).astype(np.int32)
    tgt = np.roll(ids, -1, axis=-1)
    from mop_tpu.utils import jitted_init
    params = jitted_init(model, rng, jnp.asarray(mel[:2]), jnp.asarray(ids[:2]))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    tx = optax.adamw(3e-4, weight_decay=0.1)

    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())

    def loss_fn(p, mel, ids, tgt, rng):
        p = cast_floats(p, jnp.bfloat16)
        _, loss, _ = model.apply(p, mel.astype(jnp.bfloat16), ids,
                                 targets=tgt, train=True,
                                 rngs={"dropout": rng})
        return loss.astype(jnp.float32)

    @jax.jit
    def step(p, o, mel, ids, tgt, rng):
        loss, g = jax.value_and_grad(loss_fn)(p, mel, ids, tgt, rng)
        g = cast_floats(g, jnp.float32)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    state = {}
    with mesh:
        p = replicate(params, mesh)
        o = replicate(tx.init(params), mesh)
        mb, ib, tb = shard_batch((mel, ids, tgt), mesh)
        state.update(p=p, o=o, l=None, i=0)

        def run_one():
            state["i"] += 1
            state["p"], state["o"], state["l"] = step(
                state["p"], state["o"], mb, ib, tb,
                jax.random.fold_in(rng, state["i"]))

        def barrier():
            float(state["l"])

        best, all_t = _time_windows(run_one, barrier)
    aud = b * c["t_audio"] / best / n_chips  # audio frames/sec/chip
    log(f"whisper ours: {best * 1e3:.2f} ms/step "
        f"(all {['%.1f' % (t * 1e3) for t in all_t]}), "
        f"{aud:,.0f} audio-frames/s/chip, params {n_params:,}")
    return dict(ms_per_step=round(best * 1e3, 2),
                audio_frames_per_sec_per_chip=round(aud, 1), params=n_params,
                batch=b, t_audio=c["t_audio"], t_text=c["t_text"],
                n_chips=n_chips)


def bench_torch_baseline(family):
    key = f"{family}_ms_per_step"
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            data = json.load(f)
        if key in data:
            return data[key]
    else:
        data = {}
    import torch

    sys.path.insert(0, REF)
    torch.manual_seed(0)
    if family == "gpt":
        from mop.models import create_gpt_mop
        from mop.models.quartet_attn_patch import TransformerConfig

        c = GPT
        cfg = TransformerConfig(n_layer=c["n_layer"], n_head=c["n_head"],
                                n_embd=c["n_embd"], dropout=0.0,
                                block_size=c["block_size"])
        model = create_gpt_mop(c["vocab"], cfg)
        b = 8  # small batch keeps the CPU measurement tractable
        idx = torch.randint(0, c["vocab"], (b, c["block_size"]))
        tgt = torch.roll(idx, -1, dims=-1)
        args = (idx,)
        kw = dict(targets=tgt)
        per_item = c["block_size"]  # tokens per sample

        def get_loss(out):
            return out[1]
    else:
        from mop.models import WhisperConfig, create_whisper_mop

        c = WHISPER
        cfg = WhisperConfig(n_mels=c["n_mels"], n_audio_ctx=c["t_audio"],
                            vocab_size=c["vocab"], n_text_ctx=c["t_text"],
                            n_embd=c["n_embd"], n_head=c["n_head"],
                            n_layer_enc=c["n_layer_enc"],
                            n_layer_dec=c["n_layer_dec"], dropout=0.0)
        model = create_whisper_mop(cfg)
        b = 2
        mel = torch.randn(b, c["t_audio"], c["n_mels"])
        ids = torch.randint(0, c["vocab"], (b, c["t_text"]))
        tgt = torch.roll(ids, -1, dims=-1)
        args = (mel, ids)
        kw = dict(targets=tgt)
        per_item = c["t_audio"]

        def get_loss(out):
            return out[1]

    opt = torch.optim.AdamW(model.parameters(), lr=3e-4, weight_decay=0.1)
    model.train()
    for _ in range(2):
        opt.zero_grad(set_to_none=True)
        get_loss(model(*args, **kw)).backward()
        opt.step()
    n = 4
    t0 = time.perf_counter()
    for _ in range(n):
        opt.zero_grad(set_to_none=True)
        get_loss(model(*args, **kw)).backward()
        opt.step()
    dt = (time.perf_counter() - t0) / n
    # Normalize to per-item-per-step so different batch sizes compare:
    # items/sec = b / dt; record ms per (sample at this batch).
    items_per_sec = b * per_item / dt
    log(f"{family} torch baseline: {dt * 1e3:.1f} ms/step at batch {b} "
        f"-> {items_per_sec:,.0f} items/s (CPU)")
    data[key] = {"ms_per_step": dt * 1e3, "batch": b,
                 "items_per_sec": items_per_sec}
    with open(CACHE, "w") as f:
        json.dump(data, f)
    return data[key]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=("gpt", "whisper", "all"),
                    default="all")
    args = ap.parse_args()
    fams = ["gpt", "whisper"] if args.family == "all" else [args.family]

    results = {}
    for fam in fams:
        ours = bench_gpt_ours() if fam == "gpt" else bench_whisper_ours()
        base = bench_torch_baseline(fam)
        if fam == "gpt":
            ours_items = ours["tokens_per_sec_per_chip"]
        else:
            ours_items = ours["audio_frames_per_sec_per_chip"]
        vs = ours_items / base["items_per_sec"]
        results[fam] = {"ours": ours, "torch_cpu": base,
                        "vs_baseline": round(vs, 1)}
        print(json.dumps({"metric": f"{fam}_mop_train_throughput",
                          "value": ours_items,
                          "unit": ("tokens/s/chip" if fam == "gpt"
                                   else "audio-frames/s/chip"),
                          "vs_baseline": round(vs, 1)}))

    md = os.path.join(REPO, "benchmarks", "lm_throughput.md")
    with open(md, "w") as f:
        f.write(
            "# GPT / Whisper train-step throughput\n\n"
            "Full train step (bf16 fwd/bwd, AdamW), min-of-3 windows of "
            f"{STEPS_PER_WINDOW} steps, host-transfer barrier. Torch numbers "
            "are the reference models run as-is on this host's CPU (the only "
            "torch backend available), per-item normalized.\n\n")
        if "gpt" in results:
            r = results["gpt"]
            f.write(
                f"## GPT-MoP ({r['ours']['params']:,} params, "
                f"T={GPT['block_size']}, batch={r['ours']['batch']})\n\n"
                f"- mop-tpu: **{r['ours']['tokens_per_sec_per_chip']:,.0f} "
                f"tokens/s/chip** ({r['ours']['ms_per_step']} ms/step)\n"
                f"- torch reference (CPU): "
                f"{r['torch_cpu']['items_per_sec']:,.0f} tokens/s\n"
                f"- ratio: {r['vs_baseline']}x\n\n")
        if "whisper" in results:
            r = results["whisper"]
            f.write(
                f"## Whisper-MoP ({r['ours']['params']:,} params, "
                f"T_audio={WHISPER['t_audio']}, T_text={WHISPER['t_text']}, "
                f"batch={r['ours']['batch']})\n\n"
                f"- mop-tpu: "
                f"**{r['ours']['audio_frames_per_sec_per_chip']:,.0f} "
                f"audio-frames/s/chip** ({r['ours']['ms_per_step']} "
                f"ms/step)\n"
                f"- torch reference (CPU): "
                f"{r['torch_cpu']['items_per_sec']:,.0f} audio-frames/s\n"
                f"- ratio: {r['vs_baseline']}x\n")
    log(f"wrote {md}")


if __name__ == "__main__":
    main()
