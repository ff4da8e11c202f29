"""Tensor-parallel parameter sharding over the mesh ``model`` axis.

The scaling-book recipe, not hand-written collectives: declare PartitionSpecs
for the weight matrices (column-parallel qkv/fc1, row-parallel proj/fc2 — the
Megatron pattern), place the params sharded, and let XLA's SPMD partitioner
insert the all-reduces/all-gathers. Composes with batch ("data" axis) sharding
for 2-D dp x tp meshes, and with the expert-parallel MoE path (ops/moe.py)
which uses the same axis.

The reference has no model parallelism of any kind (single device,
``cifar100_ab5_param_budgets.py:43-48``); this is part of the TPU-native
scale-out layer BASELINE.json's multi-chip target implies.

Notes:
- Rules match flattened parameter paths by regex; anything unmatched is
  replicated (embeddings, LayerNorms, gates, heads).
- GSPMD is semantics-preserving: a TP-sharded step computes the same values
  as the replicated step up to floating-point reduction order
  (tests/test_parallel_tp.py asserts fp32 equality after several steps).
- For peak efficiency on real hardware, choose tp dividing the head count so
  the qkv column split is head-aligned; correctness never depends on it.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import preprocess as pp
from .mesh import DATA_AXIS, MODEL_AXIS, batch_sharding, replicated
from .train_step import cast_floats

Array = jax.Array

# (path regex, spec) — first match wins. Covers the ViT bricks
# (components.py Linear names) and the GPT family (quartet_attn_patch /
# gpt_mop Linear names).
TP_RULES_DEFAULT: List[Tuple[str, P]] = [
    # column-parallel: split the output features
    (r"(^|/)(qkv|q_proj|k_proj|v_proj|q2_proj|k2_proj|fc|fc1|mlp_fc1)/kernel$",
     P(None, MODEL_AXIS)),
    # row-parallel: split the input features (partial sums all-reduced by XLA)
    (r"(^|/)(proj|o_proj|fc2|mlp_fc2)/kernel$", P(MODEL_AXIS, None)),
]


def _spec_for(path: str, rules) -> P:
    """First matching rule's spec; eligibility (ndim/divisibility) is decided
    by the caller so the demotion logic lives in exactly one place."""
    for pat, spec in rules:
        if re.search(pat, path):
            return spec
    return P()


def tp_param_shardings(params, mesh: Mesh, rules: Optional[Sequence] = None):
    """Tree of NamedShardings for ``params`` under the TP rules.

    A matched dimension that does not divide by the model-axis size falls
    back to replication for that leaf (with no silent wrong answers — GSPMD
    handles every placement correctly; divisibility only affects layout).
    """
    rules = TP_RULES_DEFAULT if rules is None else rules
    m = mesh.shape[MODEL_AXIS]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def shard_one(path_entries, leaf):
        path = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path_entries
        )
        spec = _spec_for(path, rules)
        if spec != P():
            axis = 0 if spec[0] == MODEL_AXIS else len(spec) - 1
            # Matmul kernels only: a name-matched conv kernel (e.g. the
            # PatchEmbed 'proj', HWIO 4-D) must not get its spatial dims
            # split. Non-dividing dims also fall back to replication.
            if leaf.ndim != 2 or leaf.shape[axis] % m != 0:
                spec = P()
        return NamedSharding(mesh, spec)

    shardings = [shard_one(p, l) for p, l in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, shardings)


def tp_shard_params(params, mesh: Mesh, rules: Optional[Sequence] = None):
    """device_put the param tree with TP shardings (everything else replicated)."""
    sh = tp_param_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def tp_init_opt_state(tx: optax.GradientTransformation, params):
    """Initialize optimizer state ON-DEVICE from already-sharded params.

    jit propagates the param shardings into the Adam moments, so mu/nu are
    sharded exactly like their parameters (no replicated copies of sharded
    weights)."""
    return jax.jit(tx.init)(params)


def make_tp_classifier_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    mean,
    std,
    augment: bool = True,
    compute_dtype=jnp.bfloat16,
):
    """Jitted dp x tp train step: batch over ``data``, weights over ``model``.

    Pass params through ``tp_shard_params`` and opt_state through
    ``tp_init_opt_state`` first; the step preserves their shardings (inferred
    from the operands — no explicit in_shardings, per the GSPMD workflow).
    """
    bsh = batch_sharding(mesh)

    def loss_fn(params, x_u8, y, rng):
        k_aug, k_drop = jax.random.split(rng)
        if augment:
            x = pp.cifar_train_augment(k_aug, x_u8, mean, std)
        else:
            x = pp.cifar_eval_transform(x_u8, mean, std)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            p = cast_floats(params, compute_dtype)
        else:
            p = params
        logits = model.apply(p, x, train=True, rngs={"dropout": k_drop})
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), y
        ).mean()
        return loss

    def step(params, opt_state, x_u8, y, rng):
        x_u8 = jax.lax.with_sharding_constraint(x_u8, bsh)
        loss, grads = jax.value_and_grad(loss_fn)(params, x_u8, y, rng)
        grads = cast_floats(grads, jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0, 1))


def make_tp_lm_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    compute_dtype=jnp.bfloat16,
    sequence_parallel: bool = False,
):
    """dp x tp train step for the GPT family (idx/targets over ``data``).

    ``sequence_parallel=True`` additionally shards the TOKEN axis of the
    inputs over the model axis (P("data", "model")). GSPMD propagates: the
    embedding lookup, LayerNorms, MoP 1-D gates and MLPs stay token-sharded
    (each shard holds T/tp tokens' activations), and the attention score
    matmuls gather/scatter exactly where full-sequence context is needed —
    the Megatron-SP pattern, derived from one input constraint instead of
    hand-placed collectives."""
    spec = P(DATA_AXIS, MODEL_AXIS) if sequence_parallel else P(DATA_AXIS)
    in_sh = NamedSharding(mesh, spec)

    def loss_fn(params, idx, targets, rng):
        p = cast_floats(params, compute_dtype) if compute_dtype is not None else params
        _, loss = model.apply(p, idx, targets=targets, train=True,
                              rngs={"dropout": rng})
        return loss.astype(jnp.float32)

    def step(params, opt_state, idx, targets, rng):
        idx = jax.lax.with_sharding_constraint(idx, in_sh)
        targets = jax.lax.with_sharding_constraint(targets, in_sh)
        loss, grads = jax.value_and_grad(loss_fn)(params, idx, targets, rng)
        grads = cast_floats(grads, jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0, 1))
