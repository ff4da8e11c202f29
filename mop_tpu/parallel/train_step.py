"""pjit-compiled data-parallel train/eval steps.

One jitted function per (model, optimizer): on-device uint8 -> augment ->
normalize -> bf16 forward/backward -> optimizer update, with the batch axis
sharded over ICI and parameters replicated (XLA inserts the gradient
all-reduce). Buffers are donated so params/opt-state update in place.

This subsumes the reference's per-step host loop
(``cifar100_ab5_param_budgets.py:789-808``) with the input pipeline moved
on-device — the core of the BASELINE.json throughput target.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import preprocess as pp
from .mesh import DATA_AXIS, batch_sharding, replicated

Array = jax.Array


def cast_floats(tree, dtype):
    """Cast float leaves (params/activations) to a compute dtype."""
    def _c(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(_c, tree)


def make_classifier_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh,
    mean,
    std,
    augment: bool = True,
    label_smoothing: float = 0.0,
    grad_clip: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
    n_classes: Optional[int] = None,
):
    """Build a jitted, sharded train step for an image classifier.

    Returns ``step(params, opt_state, x_u8, y, rng) -> (params, opt_state,
    metrics)`` where x_u8 is a uint8 NCHW batch (host or device).
    """
    rep = replicated(mesh)
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
        logits = logits.astype(jnp.float32)
        nc = n_classes or logits.shape[-1]
        if label_smoothing > 0.0:
            tgt = pp.label_smoothing_onehot(y, nc, label_smoothing)
            loss = optax.softmax_cross_entropy(logits, tgt).mean()
        else:
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return loss, acc

    def step(params, opt_state, x_u8, y, rng):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x_u8, y, rng
        )
        grads = cast_floats(grads, jnp.float32)
        if grad_clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "acc": acc}

    return jax.jit(
        step,
        in_shardings=(rep, rep, bsh, bsh, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )


def make_classifier_eval_step(model, mesh, mean, std, compute_dtype=jnp.bfloat16):
    """Jitted eval step: returns (#correct, #valid) under a padding mask."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def step(params, x_u8, y, valid_mask):
        x = pp.cifar_eval_transform(x_u8, mean, std)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            params = cast_floats(params, compute_dtype)
        logits = model.apply(params, x, train=False).astype(jnp.float32)
        correct = ((jnp.argmax(logits, -1) == y).astype(jnp.float32) * valid_mask)
        return jnp.sum(correct), jnp.sum(valid_mask)

    return jax.jit(step, in_shardings=(rep, bsh, bsh, bsh), out_shardings=(rep, rep))


def make_lm_train_step(model, tx, mesh, grad_clip: Optional[float] = None,
                       compute_dtype=jnp.bfloat16):
    """Jitted data-parallel causal-LM train step (GPT family).

    step(params, opt_state, idx, targets, rng) -> (params, opt_state, metrics)
    """
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def loss_fn(params, idx, targets, rng):
        p = cast_floats(params, compute_dtype) if compute_dtype is not None else params
        _, loss = model.apply(p, idx, targets=targets, train=True,
                              rngs={"dropout": rng})
        return loss.astype(jnp.float32)

    def step(params, opt_state, idx, targets, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, idx, targets, rng)
        grads = cast_floats(grads, jnp.float32)
        if grad_clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    return jax.jit(
        step,
        in_shardings=(rep, rep, bsh, bsh, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )
