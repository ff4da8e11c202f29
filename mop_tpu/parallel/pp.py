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

    def pipeline(stage_params, mbs):
        # Inside shard_map. The local shard of the (L, ...) stack IS this
        # stage's (l_per, ...) slice; mbs: (M, mb_local, T, D).
        stage = jax.lax.axis_index(MODEL_AXIS)
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
                out, MODEL_AXIS, [(s, s + 1) for s in range(S - 1)])
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
        return jax.lax.psum(outs * mask, MODEL_AXIS)

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
