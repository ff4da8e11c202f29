"""Fully-sharded data parallelism (FSDP / ZeRO) over the mesh ``data`` axis.

The scaling-book recipe applied to parameter storage: instead of replicating
weights on every chip (the plain-dp layout in ``train_step.py``), each float
parameter tensor is sharded along one dimension over the SAME axis the batch
is sharded on. XLA's SPMD partitioner then:

- all-gathers each weight right before its matmul (fwd and bwd) and discards
  the gathered copy afterwards — per-layer peak memory, not whole-model;
- reduce-scatters gradients instead of all-reducing them;
- keeps the AdamW moments sharded (``fsdp_init_opt_state`` places them with
  the same rule as their parameters), so optimizer state is ZeRO-sharded too.

Per-chip memory for params + grads + moments drops from ``4 x P`` to
``4 x P / n_data`` at the cost of weight all-gather traffic per step, which
rides ICI and overlaps with compute. ``shard_params=False`` gives the ZeRO-1
variant: weights stay replicated (no per-layer gather), but gradients are
reduce-scattered and the optimizer update runs on 1/n of the state, followed
by one update all-gather.

The reference has no distributed support at all (single device,
``cifar100_ab5_param_budgets.py:43-48``); like ``tp.py``/``pp.py`` this is
part of the TPU-native scale-out layer with no reference counterpart.

Semantics are preserved: tests/test_parallel_fsdp.py asserts fp32 equality
with the replicated data-parallel step after several AdamW updates.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import preprocess as pp
from .mesh import DATA_AXIS, batch_sharding, replicated
from .train_step import cast_floats

Array = jax.Array

# Parameters smaller than this many elements stay replicated: gathering a
# 1-D LayerNorm scale costs more in latency than its storage saves.
DEFAULT_MIN_SIZE = 2**12


def fsdp_spec(shape, n_shards: int, min_size: int = DEFAULT_MIN_SIZE) -> P:
    """PartitionSpec sharding the largest dividing dim over the data axis.

    Scalars, small tensors, and tensors with no dimension divisible by
    ``n_shards`` are replicated — GSPMD keeps every placement correct;
    the spec only decides storage layout.
    """
    if not shape or math.prod(shape) < min_size:
        return P()
    order = sorted(range(len(shape)), key=lambda i: (-shape[i], i))
    for i in order:
        if shape[i] % n_shards == 0:
            spec = [None] * len(shape)
            spec[i] = DATA_AXIS
            return P(*spec)
    return P()


def fsdp_param_shardings(params, mesh: Mesh,
                         min_size: int = DEFAULT_MIN_SIZE):
    """Tree of NamedShardings placing each leaf by ``fsdp_spec``."""
    n = mesh.shape[DATA_AXIS]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, fsdp_spec(jnp.shape(x), n, min_size)),
        params,
    )


def fsdp_shard_params(params, mesh: Mesh, min_size: int = DEFAULT_MIN_SIZE):
    """device_put the param tree with FSDP shardings."""
    sh = fsdp_param_shardings(params, mesh, min_size)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def fsdp_init_opt_state(tx: optax.GradientTransformation, params, mesh: Mesh,
                        min_size: int = DEFAULT_MIN_SIZE):
    """Initialize optimizer state ON-DEVICE with FSDP-sharded moments.

    Out-shardings are derived from the state's own leaf shapes by the same
    ``fsdp_spec`` rule as the parameters (moments mirror parameter shapes;
    scalar step counts replicate). Explicit out_shardings, not propagation:
    ``tx.init`` creates fresh zeros with no operand linkage, so GSPMD would
    otherwise be free to replicate them.
    """
    state_shape = jax.eval_shape(tx.init, params)
    n = mesh.shape[DATA_AXIS]
    out_sh = jax.tree_util.tree_map(
        lambda a: NamedSharding(mesh, fsdp_spec(a.shape, n, min_size)),
        state_shape,
    )
    return jax.jit(tx.init, out_shardings=out_sh)(params)


# ZeRO-1 (replicated params, sharded moments) needs exactly the same state
# init — only the parameter placement and train-step constraints differ.
zero1_init_opt_state = fsdp_init_opt_state


def _make_constrainer(mesh: Mesh, min_size: int):
    n = mesh.shape[DATA_AXIS]

    def constrain(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, fsdp_spec(jnp.shape(x), n, min_size))
            ),
            tree,
        )

    return constrain


def make_fsdp_classifier_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    mean,
    std,
    augment: bool = True,
    grad_clip: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
    min_size: int = DEFAULT_MIN_SIZE,
    shard_params: bool = True,
):
    """Jitted FSDP train step for an image classifier.

    ``shard_params=True`` (FSDP/ZeRO-3): pass params through
    ``fsdp_shard_params`` and opt_state through ``fsdp_init_opt_state``.
    ``shard_params=False`` (ZeRO-1): replicate params, build opt_state with
    ``zero1_init_opt_state``. Either way the step re-asserts the layout via
    sharding constraints so XLA reduce-scatters gradients and runs the
    optimizer update on shards.
    """
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    constrain = _make_constrainer(mesh, min_size)

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
        # Gradients take the (sharded) parameter layout -> reduce-scatter.
        grads = constrain(grads)
        if grad_clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        opt_state = constrain(opt_state)
        params = optax.apply_updates(params, updates)
        if shard_params:
            params = constrain(params)
        else:
            params = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, rep), params)
        return params, opt_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0, 1))


def make_fsdp_lm_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    grad_clip: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
    min_size: int = DEFAULT_MIN_SIZE,
    shard_params: bool = True,
):
    """FSDP train step for the GPT family (idx/targets over ``data``)."""
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    constrain = _make_constrainer(mesh, min_size)

    def loss_fn(params, idx, targets, rng):
        p = cast_floats(params, compute_dtype) if compute_dtype is not None \
            else params
        _, loss = model.apply(p, idx, targets=targets, train=True,
                              rngs={"dropout": rng})
        return loss.astype(jnp.float32)

    def step(params, opt_state, idx, targets, rng):
        idx = jax.lax.with_sharding_constraint(idx, bsh)
        targets = jax.lax.with_sharding_constraint(targets, bsh)
        loss, grads = jax.value_and_grad(loss_fn)(params, idx, targets, rng)
        grads = cast_floats(grads, jnp.float32)
        grads = constrain(grads)
        if grad_clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        opt_state = constrain(opt_state)
        params = optax.apply_updates(params, updates)
        if shard_params:
            params = constrain(params)
        else:
            params = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, rep), params)
        return params, opt_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0, 1))
