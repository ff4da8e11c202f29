"""Pipeline parallelism for the GPT family: GPipe schedule over the mesh
``model`` axis.

The transformer block stack is split into S contiguous stages, one per
device along the model axis; microbatches flow through the stages with
activations handed over by ``ppermute`` inside a ``shard_map``. The schedule
is plain GPipe: M microbatches take M + S - 1 ticks, with the classic bubble
at fill/drain. ``jax.grad`` differentiates straight through the schedule
(ppermute/psum have transpose rules), so the SAME code trains.

Embedding, final LayerNorm, tied head, and the loss run outside the
shard_map (replicated / data-sharded, handled by GSPMD); only the block
stack is pipelined — stage weights never replicate, which is the memory
point of pipeline parallelism.

The reference is single-device only (``cifar100_ab5_param_budgets.py:43-48``);
this completes the dp/tp/sp/ep/pp scale-out set of the TPU-native layer.
Composes with data parallelism: microbatch contents stay sharded over the
``data`` axis throughout.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gpt_mop import GPT_MoP, MoPBlock
from ..models.layers import LayerNorm
from ..models.quartet_attn_patch import Block, TinyTransformerLM
from .mesh import DATA_AXIS, MODEL_AXIS
from .train_step import cast_floats

Array = jax.Array


def block_module_for(model):
    """The per-layer block module matching ``model`` (GPT family)."""
    if isinstance(model, GPT_MoP):
        return MoPBlock(model.config, n_views=model.n_views,
                        n_kernels=model.n_kernels)
    if isinstance(model, TinyTransformerLM):
        return Block(model.config)
    raise TypeError(f"no pipeline block known for {type(model).__name__}")


def split_gpt_params(params, n_layer: int):
    """Split a GPT param tree into (stem, stacked blocks, head).

    stem: wte (+wpe); head: ln_f; blocks: every ``blocks_i`` subtree stacked
    into leaves with a leading (n_layer, ...) axis — the stacking that lets
    the stage loop be a ``lax.scan`` and the stage axis be sharded.
    """
    p = params["params"]
    stem = {k: p[k] for k in ("wte", "wpe") if k in p}
    head = {"ln_f": p["ln_f"]}
    blocks = [p[f"blocks_{i}"] for i in range(n_layer)]
    stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *blocks)
    return stem, stacked, head


def merge_gpt_params(stem, stacked, head, n_layer: int):
    """Inverse of split_gpt_params (for handing back to ``model.apply``)."""
    p = dict(stem)
    for i in range(n_layer):
        p[f"blocks_{i}"] = jax.tree_util.tree_map(lambda l: l[i], stacked)
    p.update(head)
    return {"params": p}


def _pp_shardings(mesh: Mesh, stem, stacked, head):
    rep = NamedSharding(mesh, P())
    stg = NamedSharding(mesh, P(MODEL_AXIS))
    return (
        jax.tree_util.tree_map(lambda _: rep, stem),
        jax.tree_util.tree_map(lambda _: stg, stacked),
        jax.tree_util.tree_map(lambda _: rep, head),
    )


def place_pp_params(params, mesh: Mesh, n_layer: int):
    """Split + device_put: blocks sharded stage-major over ``model``."""
    stem, stacked, head = split_gpt_params(params, n_layer)
    s_stem, s_stk, s_head = _pp_shardings(mesh, stem, stacked, head)
    stem = jax.tree_util.tree_map(jax.device_put, stem, s_stem)
    stacked = jax.tree_util.tree_map(jax.device_put, stacked, s_stk)
    head = jax.tree_util.tree_map(jax.device_put, head, s_head)
    return stem, stacked, head


def _gpipe_pipeline(stage_fn, S: int, M: int, axis: str):
    """GPipe forward schedule over mesh axis ``axis`` (runs inside
    shard_map; differentiable — jax.grad pipelines the reverse sweep)."""

    def pipeline(stage_params, mbs):
        # The local shard of the (L, ...) stack IS this stage's (l_per, ...)
        # slice; mbs: (M, mb_local, T, D).
        stage = jax.lax.axis_index(axis)
        mb_shape = mbs.shape[1:]
        outs0 = jnp.zeros((M,) + mb_shape, mbs.dtype)

        def tick(carry, t):
            recv, outs = carry
            # Fill-phase safety: before tick t == stage, nothing real has
            # arrived (ppermute delivers zeros) and running the stage on a
            # constant input NaNs the score standardization — which would
            # poison the backward pass even under zero cotangents. Feed real
            # embeddings instead; the result is discarded.
            safe = mbs[jnp.minimum(t, M - 1)]
            inp = jnp.where(stage == 0, safe, jnp.where(t >= stage, recv, safe))
            out = stage_fn(stage_params, inp)
            send = jax.lax.ppermute(
                out, axis, [(s, s + 1) for s in range(S - 1)])
            # Stage S-1 finishes microbatch m = t-(S-1) at tick t. Early
            # (t < S-1) writes clamp to slot 0 and are overwritten by the
            # real slot-0 result at t = S-1.
            m = jnp.maximum(t - (S - 1), 0)
            outs = jax.lax.dynamic_update_index_in_dim(outs, out, m, 0)
            return (send, outs), None

        (_, outs), _ = jax.lax.scan(
            tick, (jnp.zeros(mb_shape, mbs.dtype), outs0),
            jnp.arange(M + S - 1))
        # Broadcast the last stage's collected outputs to every stage.
        mask = (stage == S - 1).astype(outs.dtype)
        return jax.lax.psum(outs * mask, axis)

    return pipeline


def make_pp_lm_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    n_microbatches: int,
    compute_dtype=None,
):
    """GPipe train step. Params must come from ``place_pp_params``.

    step(stem, stacked, head, opt_state, idx (B,T), targets (B,T)) ->
    (stem, stacked, head, opt_state, {'loss': ...}).
    B must divide by n_microbatches (and the microbatch by the data-axis
    size); cfg.n_layer must divide by the model-axis size.
    """
    cfg = model.config
    block = block_module_for(model)
    S = mesh.shape[MODEL_AXIS]
    M = n_microbatches
    assert cfg.n_layer % S == 0, (cfg.n_layer, S)
    assert cfg.dropout == 0.0, (
        "pipeline stages run deterministically (no per-stage dropout rngs "
        "are threaded through the schedule); use cfg.dropout=0.0"
    )
    l_per = cfg.n_layer // S

    def stage_fn(stage_params, x):
        # stage_params leaves: (l_per, ...) — this stage's slice of the stack.
        def body(h, p):
            return block.apply({"params": p}, h, train=False), None
        h, _ = jax.lax.scan(body, x, stage_params)
        return h

    pipeline = _gpipe_pipeline(stage_fn, S, M, MODEL_AXIS)

    pipelined = jax.shard_map(
        pipeline,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(None, DATA_AXIS)),
        out_specs=P(None, DATA_AXIS),
        # The scan carry starts as device-invariant zeros but becomes varying
        # after the first ppermute; skip the VMA typecheck rather than pcast
        # (keeps compatibility across jax versions that lack lax.pcast).
        check_vma=False,
    )

    def loss_fn(stem, stacked, head, idx, targets):
        if compute_dtype is not None:
            stem = cast_floats(stem, compute_dtype)
            stacked = cast_floats(stacked, compute_dtype)
            head = cast_floats(head, compute_dtype)
        b, t = idx.shape
        mb = b // M
        x = stem["wte"]["embedding"][idx]
        if "wpe" in stem:
            x = x + stem["wpe"]["embedding"][jnp.arange(t)][None]
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        mbs = x.reshape(M, mb, t, x.shape[-1])
        outs = pipelined(stacked, mbs)
        h = outs.reshape(b, t, x.shape[-1])
        h = LayerNorm().apply({"params": head["ln_f"]}, h)
        logits = h @ stem["wte"]["embedding"].T  # tied head
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, targets[..., None], -1))

    def step(stem, stacked, head, opt_state, idx, targets):
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
            stem, stacked, head, idx, targets)
        grads = cast_floats(grads, jnp.float32)
        params = (stem, stacked, head)
        updates, opt_state = tx.update(grads, opt_state, params)
        stem, stacked, head = optax.apply_updates(params, updates)
        return stem, stacked, head, opt_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0, 1, 2, 3))


def pp_init_opt_state(tx: optax.GradientTransformation, stem, stacked, head):
    """On-device optimizer init; moments inherit the stage shardings."""
    return jax.jit(tx.init)((stem, stacked, head))


# --------------------------- 1F1B schedule ---------------------------
#
# The GPipe step above differentiates THROUGH the forward schedule with
# jax.grad: simple, but (a) XLA keeps every microbatch's stage activations
# live across the whole forward phase (peak activation memory scales with M),
# and (b) no dropout (no rngs threaded through the schedule). The 1F1B step
# below hand-schedules both passes in ONE lax.scan: each tick runs one stage
# forward AND one stage backward (recompute-from-stage-input + in-tick
# jax.vjp), with per-microbatch losses seeded on the last stage the moment
# its forward finishes. In-flight stage inputs live in a circular buffer of
# depth min(M, 2S-1) — peak activation memory is O(S) microbatches instead
# of O(M). Dropout is supported: keys are derived deterministically as
# fold_in(base, microbatch) then fold_in(., global_layer), so the recompute
# in the backward tick replays the identical mask, and a single-device
# composition using the same folding reproduces the math exactly (the
# equality test in tests/test_parallel_pp_1f1b.py).
#
# Schedule (tick t, stage s, S stages, M microbatches):
#   forward of microbatch m at t = m + s
#   backward of microbatch m at t = m + 2(S-1) - s
#   (last stage: backward immediately follows forward in the same tick)
# Total 1F1B ticks: M + 2S - 2; GPipe AD equivalent: 2(M + S - 1) tick-
# passes. Work per tick is fwd + recompute&bwd when both slots are active.


def _stage_layer_ids(stage, l_per):
    return stage * l_per + jnp.arange(l_per)


def make_pp_lm_train_step_1f1b(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    n_microbatches: int,
    compute_dtype=None,
):
    """1F1B pipeline train step with dropout support.

    Same calling convention as ``make_pp_lm_train_step``:
    step(stem, stacked, head, opt_state, idx (B,T), targets (B,T), rng) ->
    (stem, stacked, head, opt_state, {'loss': ...}).  Unlike the GPipe step,
    cfg.dropout may be nonzero; pass a PRNGKey as ``rng``.
    """
    cfg = model.config
    block = block_module_for(model)
    S = mesh.shape[MODEL_AXIS]
    M = n_microbatches
    assert cfg.n_layer % S == 0, (cfg.n_layer, S)
    l_per = cfg.n_layer // S
    D = min(M, 2 * S - 1)  # circular-buffer depth (in-flight microbatches)

    def stage_fn(stage_params, x, rng_mb, stage):
        lids = _stage_layer_ids(stage, l_per)

        def body(h, xs):
            p, lid = xs
            key = jax.random.fold_in(rng_mb, lid)
            return (
                block.apply({"params": p}, h, train=True,
                            rngs={"dropout": key}),
                None,
            )

        h, _ = jax.lax.scan(body, x, (stage_params, lids))
        return h

    def head_loss(out, tgt, wte_emb, lnf):
        """Per-microbatch mean CE through ln_f + tied head; weight 1/M so the
        sum over microbatches equals the full-batch mean."""
        h = LayerNorm().apply({"params": lnf}, out)
        logits = h @ wte_emb.T
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.mean(jnp.take_along_axis(logp, tgt[..., None], -1))
        return nll / M

    def pipeline(stage_params, mbs, tgts, wte_emb, lnf, rng):
        # Inside shard_map. mbs: (M, mb_local, T, Dm); tgts: (M, mb_local, T).
        stage = jax.lax.axis_index(MODEL_AXIS)
        n_data = mesh.shape[DATA_AXIS]
        mb_shape = mbs.shape[1:]
        fdt = mbs.dtype

        # Fold the data-shard index in: inside shard_map flax draws masks at
        # the LOCAL shape, so without this every data shard would reuse the
        # same dropout mask for different samples (and the single-device
        # oracle could never match). reference_1f1b_composition mirrors this
        # exact folding.
        didx = jax.lax.axis_index(DATA_AXIS)

        def rng_for(m):
            return jax.random.fold_in(
                jax.random.fold_in(rng, m), 2**18 + didx)

        # Seed the in-flight buffer with REAL embeddings, not zeros: invalid
        # backward slots during fill/drain still run stage_fn + vjp on the
        # stored value, and constant input NaNs the score-standardization
        # grad (d sqrt at 0), which would poison gacc even under zero
        # cotangent weights (0 * nan = nan).
        buf0 = jnp.broadcast_to(mbs[0], (D,) + mb_shape).astype(fdt)
        g0 = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape, jnp.float32), stage_params)
        dwte0 = jnp.zeros(wte_emb.shape, jnp.float32)
        dlnf0 = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape, jnp.float32), lnf)
        dmbs0 = jnp.zeros(mbs.shape, jnp.float32)

        def tick(carry, t):
            recv_f, recv_b, buf, gacc, dwte, dlnf, dmbs, lsum = carry

            # ---- forward slot: microbatch m_f = t - stage ----
            m_f = t - stage
            valid_f = (m_f >= 0) & (m_f < M)
            m_f_c = jnp.clip(m_f, 0, M - 1)
            safe = mbs[m_f_c]
            inp = jnp.where(stage == 0, safe,
                            jnp.where(valid_f & (t >= stage), recv_f, safe))
            out = stage_fn(stage_params, inp, rng_for(m_f_c), stage)
            send_f = jax.lax.ppermute(
                out, MODEL_AXIS, [(s, s + 1) for s in range(S - 1)])
            buf = jax.lax.dynamic_update_index_in_dim(
                buf, jnp.where(valid_f, inp, buf[m_f_c % D]), m_f_c % D, 0)

            # ---- loss seed on the last stage (same tick as its forward) ----
            loss_m, dout = jax.value_and_grad(head_loss)(
                out.astype(jnp.float32), tgts[m_f_c], wte_emb, lnf)
            on_last = (stage == S - 1) & valid_f
            lsum = lsum + jnp.where(on_last, loss_m, 0.0)
            # head param grads (wte via tied head + ln_f), masked to last stage
            def head_grads(out, tgt):
                return jax.grad(
                    lambda we, lf: head_loss(out, tgt, we, lf),
                    argnums=(0, 1))(wte_emb, lnf)
            g_wte, g_lnf = head_grads(out.astype(jnp.float32), tgts[m_f_c])
            w_last = jnp.where(on_last, 1.0, 0.0)
            dwte = dwte + w_last * g_wte
            dlnf = jax.tree_util.tree_map(
                lambda a, g: a + w_last * g, dlnf, g_lnf)

            # ---- backward slot: microbatch m_b = t - 2(S-1) + stage ----
            m_b = t - 2 * (S - 1) + stage
            valid_b = (m_b >= 0) & (m_b < M)
            m_b_c = jnp.clip(m_b, 0, M - 1)
            # Per-data-shard head_loss is the LOCAL microbatch-slice mean;
            # the true loss is the mean over data shards, so the backward
            # seed carries a 1/n_data factor (grads are then psum'd over the
            # data axis after the scan).
            cot = jnp.where(stage == S - 1, (dout / n_data).astype(fdt),
                            recv_b)
            stored = buf[m_b_c % D]
            _, vjp = jax.vjp(
                lambda p, x: stage_fn(p, x, rng_for(m_b_c), stage),
                stage_params, stored)
            dp, dx = vjp(cot)
            w_b = jnp.where(valid_b, 1.0, 0.0)
            gacc = jax.tree_util.tree_map(
                lambda a, g: a + w_b * g.astype(jnp.float32), gacc, dp)
            send_b = jax.lax.ppermute(
                dx, MODEL_AXIS, [(s, s - 1) for s in range(1, S)])
            on_first = (stage == 0) & valid_b
            dmbs = jax.lax.dynamic_update_index_in_dim(
                dmbs,
                jnp.where(on_first, dx.astype(jnp.float32), dmbs[m_b_c]),
                m_b_c, 0)

            return (send_f, send_b, buf, gacc, dwte, dlnf, dmbs, lsum), None

        carry0 = (jnp.zeros(mb_shape, fdt), jnp.zeros(mb_shape, fdt), buf0,
                  g0, dwte0, dlnf0, dmbs0, jnp.zeros((), jnp.float32))
        (_, _, _, gacc, dwte, dlnf, dmbs, lsum), _ = jax.lax.scan(
            tick, carry0, jnp.arange(M + 2 * S - 2))

        # Broadcast per-stage partials: head grads + loss live on the last
        # stage, the embedding cotangents on stage 0 (already masked).
        # Data-axis reductions are explicit (grads are hand-rolled here, so
        # GSPMD cannot insert them): stage/head grads sum contributions from
        # every data shard; the loss and head grads carry the 1/n_data
        # local-mean factor via pmean / the seeded cotangent.
        gacc = jax.tree_util.tree_map(
            lambda a: jax.lax.psum(a, DATA_AXIS), gacc)
        dwte = jax.lax.pmean(jax.lax.psum(dwte, MODEL_AXIS), DATA_AXIS)
        dlnf = jax.tree_util.tree_map(
            lambda a: jax.lax.pmean(jax.lax.psum(a, MODEL_AXIS), DATA_AXIS),
            dlnf)
        dmbs = jax.lax.psum(dmbs, MODEL_AXIS)
        lsum = jax.lax.pmean(jax.lax.psum(lsum, MODEL_AXIS), DATA_AXIS)
        return gacc, dwte, dlnf, dmbs, lsum

    pipelined = jax.shard_map(
        pipeline,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(None, DATA_AXIS), P(None, DATA_AXIS),
                  P(), P(), P()),
        out_specs=(P(MODEL_AXIS), P(), P(), P(None, DATA_AXIS), P()),
        check_vma=False,
    )

    def step(stem, stacked, head, opt_state, idx, targets, rng):
        b, t = idx.shape
        mb = b // M
        cdt = compute_dtype or jnp.float32
        c_stem = cast_floats(stem, cdt) if compute_dtype else stem
        c_stacked = cast_floats(stacked, cdt) if compute_dtype else stacked
        c_head = cast_floats(head, cdt) if compute_dtype else head

        # Embedding (+ its dropout) outside the pipelined region; hand-built
        # backward below via jax.vjp using the collected cotangents.
        k_embed = jax.random.fold_in(rng, 2**20)

        def embed_all(stem_p):
            x = stem_p["wte"]["embedding"][idx]
            if "wpe" in stem_p:
                x = x + stem_p["wpe"]["embedding"][jnp.arange(t)][None]
            if cfg.dropout > 0.0:
                keep = 1.0 - cfg.dropout
                mask = jax.random.bernoulli(k_embed, keep, x.shape)
                x = jnp.where(mask, x / keep, 0.0)
            return x.astype(cdt)

        x, embed_vjp = jax.vjp(embed_all, c_stem)
        mbs = x.reshape(M, mb, t, x.shape[-1])
        tgts = targets.reshape(M, mb, t)

        gacc, dwte_head, dlnf, dmbs, loss = pipelined(
            c_stacked, mbs, tgts, c_stem["wte"]["embedding"], c_head["ln_f"],
            rng)

        dx = dmbs.reshape(b, t, x.shape[-1]).astype(x.dtype)
        (dstem,) = embed_vjp(dx)
        dstem = cast_floats(dstem, jnp.float32)
        dstem["wte"]["embedding"] = (
            dstem["wte"]["embedding"] + dwte_head)  # tied head path
        grads = (dstem, cast_floats(gacc, jnp.float32), {"ln_f": dlnf})

        params = (stem, stacked, head)
        updates, opt_state = tx.update(grads, opt_state, params)
        stem, stacked, head = optax.apply_updates(params, updates)
        return stem, stacked, head, opt_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0, 1, 2, 3))


def reference_1f1b_composition(model, stem, stacked, head, idx, targets, rng,
                               n_microbatches: int, n_data: int = 1):
    """Single-device composition using the SAME dropout-key folding as the
    1F1B schedule — the equality oracle for tests. ``n_data`` must match the
    mesh's data-axis size: inside shard_map flax draws dropout masks per
    data shard with fold_in(., 2**18 + shard), so the oracle slices each
    microbatch the same way. Returns (loss, grads)."""
    cfg = model.config
    block = block_module_for(model)
    M = n_microbatches
    b, t = idx.shape
    mb = b // M
    assert mb % n_data == 0, (mb, n_data)
    sl = mb // n_data

    def loss_fn(stem, stacked, head):
        x = stem["wte"]["embedding"][idx]
        if "wpe" in stem:
            x = x + stem["wpe"]["embedding"][jnp.arange(t)][None]
        if cfg.dropout > 0.0:
            keep = 1.0 - cfg.dropout
            mask = jax.random.bernoulli(
                jax.random.fold_in(rng, 2**20), keep, x.shape)
            x = jnp.where(mask, x / keep, 0.0)
        mbs = x.reshape(M, mb, t, x.shape[-1])
        tgts = targets.reshape(M, mb, t)
        total = 0.0
        for m in range(M):
            rng_mb = jax.random.fold_in(rng, m)
            for d in range(n_data):
                h = mbs[m][d * sl:(d + 1) * sl]
                key_d = jax.random.fold_in(rng_mb, 2**18 + d)
                for lid in range(cfg.n_layer):
                    p = jax.tree_util.tree_map(lambda a: a[lid], stacked)
                    key = jax.random.fold_in(key_d, lid)
                    h = block.apply({"params": p}, h, train=True,
                                    rngs={"dropout": key})
                h = LayerNorm().apply({"params": head["ln_f"]}, h)
                logits = h @ stem["wte"]["embedding"].T
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                total = total - jnp.mean(jnp.take_along_axis(
                    logp, tgts[m][d * sl:(d + 1) * sl][..., None], -1)) \
                    / (M * n_data)
        return total

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
        stem, stacked, head)
    return loss, grads


# ---------------------- composed dp x tp x pp ----------------------
#
# Pipeline stages are MANUAL only over the 'stage' axis (jax.shard_map
# axis_names); inside each stage the block math stays under GSPMD, so
# tensor-parallel param shardings over 'model' (Megatron column/row rules,
# tp.py) propagate and XLA inserts the TP collectives — while the batch
# stays sharded over 'data'. One step composes all three meanings of
# "parallel" on a ('data', 'model', 'stage') mesh (mesh.make_mesh3).


def place_pp_tp_params(params, mesh: Mesh, n_layer: int):
    """Split + device_put for the composed step: blocks sharded stage-major
    over 'stage' AND tensor-sharded over 'model' via the Megatron rules."""
    from .mesh import STAGE_AXIS
    from .tp import TP_RULES_DEFAULT, _spec_for

    stem, stacked, head = split_gpt_params(params, n_layer)
    rep = NamedSharding(mesh, P())
    m = mesh.shape[MODEL_AXIS]
    flat = jax.tree_util.tree_flatten_with_path(stacked)[0]

    def shard_one(path_entries, leaf):
        path = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path_entries
        )
        spec = _spec_for(path, TP_RULES_DEFAULT)
        # stacked leaves carry a leading (l_per-sharded) layer axis, so a
        # matmul kernel is 3-D here; demote to stage-only sharding when the
        # matched dim does not divide (same policy as tp_param_shardings).
        if spec != P():
            axis = 1 if spec[0] == MODEL_AXIS else leaf.ndim - 1
            if leaf.ndim != 3 or leaf.shape[axis] % m != 0:
                spec = P()
        full = P(STAGE_AXIS, *spec)
        return NamedSharding(mesh, full)

    shardings = [shard_one(p, l) for p, l in flat]
    s_stacked = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(stacked), shardings)
    stem = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, rep), stem)
    stacked = jax.tree_util.tree_map(jax.device_put, stacked, s_stacked)
    head = jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), head)
    return stem, stacked, head


def make_pp_tp_lm_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    n_microbatches: int,
    compute_dtype=None,
):
    """Composed dp x tp x pp GPipe train step on a make_mesh3 mesh.

    Params must come from ``place_pp_tp_params``. Same signature/semantics
    as ``make_pp_lm_train_step`` (dropout must be 0)."""
    from .mesh import STAGE_AXIS

    cfg = model.config
    block = block_module_for(model)
    S = mesh.shape[STAGE_AXIS]
    M = n_microbatches
    assert cfg.n_layer % S == 0, (cfg.n_layer, S)
    assert cfg.dropout == 0.0, "use the 1F1B step for dropout"
    l_per = cfg.n_layer // S

    def stage_fn(stage_params, x):
        def body(h, p):
            return block.apply({"params": p}, h, train=False), None
        h, _ = jax.lax.scan(body, x, stage_params)
        return h

    pipeline = _gpipe_pipeline(stage_fn, S, M, STAGE_AXIS)

    pipelined = jax.shard_map(
        pipeline,
        mesh=mesh,
        # Manual ONLY over 'stage': specs may not mention auto axes — the
        # 'model' (TP) and 'data' (batch) shardings ride the argument
        # shardings and GSPMD compiles the stage interior.
        in_specs=(P(STAGE_AXIS), P()),
        out_specs=P(),
        axis_names=frozenset({STAGE_AXIS}),
        check_vma=False,
    )

    def loss_fn(stem, stacked, head, idx, targets):
        if compute_dtype is not None:
            stem = cast_floats(stem, compute_dtype)
            stacked = cast_floats(stacked, compute_dtype)
            head = cast_floats(head, compute_dtype)
        b, t = idx.shape
        mb = b // M
        x = stem["wte"]["embedding"][idx]
        if "wpe" in stem:
            x = x + stem["wpe"]["embedding"][jnp.arange(t)][None]
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        mbs = x.reshape(M, mb, t, x.shape[-1])
        mbs = jax.lax.with_sharding_constraint(
            mbs, NamedSharding(mesh, P(None, DATA_AXIS)))
        outs = pipelined(stacked, mbs)
        h = outs.reshape(b, t, x.shape[-1])
        h = LayerNorm().apply({"params": head["ln_f"]}, h)
        logits = h @ stem["wte"]["embedding"].T  # tied head
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, targets[..., None], -1))

    def step(stem, stacked, head, opt_state, idx, targets):
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
            stem, stacked, head, idx, targets)
        grads = cast_floats(grads, jnp.float32)
        params = (stem, stacked, head)
        updates, opt_state = tx.update(grads, opt_state, params)
        stem, stacked, head = optax.apply_updates(params, updates)
        return stem, stacked, head, opt_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0, 1, 2, 3))
