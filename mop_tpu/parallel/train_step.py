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
    accum_steps: int = 1,
):
    """Build a jitted, sharded train step for an image classifier.

    Returns ``step(params, opt_state, x_u8, y, rng) -> (params, opt_state,
    metrics)`` where x_u8 is a uint8 NCHW batch (host or device).

    ``accum_steps > 1``: gradient accumulation — the batch is split into
    that many microbatches scanned sequentially (activation memory drops to
    one microbatch's worth; fp32 grads accumulate across the scan), then ONE
    optimizer update fires. Semantically a plain step on the full batch up
    to fp32 reassociation and per-microbatch rng folding
    (tests/test_grad_accum.py pins equality at augment off / dropout 0).
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

    def _grads(params, x_u8, y, rng):
        if accum_steps == 1:
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, x_u8, y, rng
            )
            return loss, acc, cast_floats(grads, jnp.float32)
        b = x_u8.shape[0]
        if b % accum_steps != 0:
            raise ValueError(
                f"batch {b} not divisible by accum_steps {accum_steps}")
        mb = NamedSharding(mesh, P(None, DATA_AXIS))
        # Interleaved split (row r -> microbatch r % accum): every device's
        # contiguous batch shard contributes equally to every microbatch,
        # so the regroup is device-local — a contiguous split would need a
        # cross-device all-to-all of the whole batch each step. Grouping is
        # irrelevant to the result (grads sum over the full batch).
        ilv = lambda a: a.reshape(b // accum_steps, accum_steps,
                                  *a.shape[1:]).swapaxes(0, 1)
        xs = jax.lax.with_sharding_constraint(ilv(x_u8), mb)
        ys = jax.lax.with_sharding_constraint(ilv(y), mb)

        def body(carry, inp):
            g_acc, l_acc, a_acc = carry
            xb, yb, i = inp
            (l, a), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, xb, yb, jax.random.fold_in(rng, i))
            g_acc = jax.tree_util.tree_map(
                lambda s, gg: s + gg.astype(jnp.float32), g_acc, g)
            return (g_acc, l_acc + l, a_acc + a), None

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(jnp.shape(p), jnp.float32), params)
        (g, l, a), _ = jax.lax.scan(
            body, (zeros, jnp.float32(0.0), jnp.float32(0.0)),
            (xs, ys, jnp.arange(accum_steps)))
        inv = 1.0 / accum_steps
        grads = jax.tree_util.tree_map(lambda t: t * inv, g)
        return l * inv, a * inv, grads

    def step(params, opt_state, x_u8, y, rng):
        loss, acc, grads = _grads(params, x_u8, y, rng)
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


def make_classifier_eval_step(model, mesh, mean, std, compute_dtype=None):
    """Jitted eval step: returns (#correct, #valid) under a padding mask.

    Defaults to fp32 (``compute_dtype=None``): eval/McNemar statistics are
    accuracy-critical and cheap, and bf16 argmax flips on borderline samples
    would contaminate per-sample parity stats vs the fp32 torch reference.
    """
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


def make_scanned_classifier_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh,
    mean,
    std,
    unroll_steps: int,
    augment: bool = True,
    label_smoothing: float = 0.0,
    grad_clip: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
    remat: str = "none",
):
    """K train steps in ONE dispatch via ``lax.scan`` over a stacked
    (K, B, ...) super-batch — a device-side training loop.

    Amortizes per-call dispatch latency (significant through a tunneled
    backend) and lets XLA overlap step boundaries. Returns
    ``step(params, opt_state, x_u8 (K,B,C,H,W), y (K,B), rng) ->
    (params, opt_state, {'loss': (K,), 'acc': (K,)})``.

    ``remat``: "none" | "full" (jax.checkpoint around the forward —
    recompute in backward, trading FLOPs for activation HBM traffic) |
    "dots" (checkpoint_dots policy: matmul outputs saved, elementwise
    recomputed). Measured per shape in benchmarks/remat.md.
    """
    rep = replicated(mesh)
    bsh = NamedSharding(mesh, P(None, DATA_AXIS))  # batch axis is dim 1

    def fwd(p, x, k_drop):
        return model.apply(p, x, train=True, rngs={"dropout": k_drop})

    if remat == "full":
        fwd = jax.checkpoint(fwd)
    elif remat == "dots":
        fwd = jax.checkpoint(
            fwd, policy=jax.checkpoint_policies.checkpoint_dots)
    elif remat != "none":
        raise ValueError(f"unknown remat mode {remat!r}")

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
        logits = fwd(p, x, k_drop)
        logits = logits.astype(jnp.float32)
        if label_smoothing > 0.0:
            tgt = pp.label_smoothing_onehot(y, logits.shape[-1], label_smoothing)
            loss = optax.softmax_cross_entropy(logits, tgt).mean()
        else:
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return loss, acc

    def one_step(carry, batch):
        params, opt_state, rng = carry
        x_u8, y = batch
        rng, sub = jax.random.split(rng)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x_u8, y, sub)
        grads = cast_floats(grads, jnp.float32)
        if grad_clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, rng), (loss, acc)

    def step(params, opt_state, x_u8, y, rng):
        (params, opt_state, _), (losses, accs) = jax.lax.scan(
            one_step, (params, opt_state, rng), (x_u8, y))
        return params, opt_state, {"loss": losses, "acc": accs}

    return jax.jit(
        step,
        in_shardings=(rep, rep, bsh, bsh, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )


def make_imagenet_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh,
    mean,
    std,
    n_classes: int,
    label_smoothing: float = 0.1,
    use_randaug: bool = False,
    randaug_n: int = 2,
    randaug_m: int = 9,
    random_erasing: float = 0.25,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    mix_prob: float = 0.5,
    grad_clip: Optional[float] = 1.0,
    compute_dtype=jnp.bfloat16,
    remat: str = "none",
):
    """ImageNet-style train step with the reference's full regularization suite
    (``imagenet_ab_param_budgets.py``): crop/flip, RandAugment-lite,
    RandomErasing, Mixup/CutMix arbitration by ``mix_prob`` (:676-694), label
    smoothing (:652-654), grad clip (:700-703) — all on-device in one jit.

    ``remat``: "none" | "full" | "dots" | "dots_nb" — jax.checkpoint around
    the NETWORK forward only (the augmentation pipeline is never
    recomputed): "full" saves only the network inputs and re-runs the
    forward during backward; "dots" saves matmul outputs
    (checkpoint_dots); "dots_nb" saves only matmul outputs with no batch
    dims (dots_with_no_batch_dims_saveable — weight-stationary saves).
    Trades recompute FLOPs for activation HBM traffic; measured per shape
    in benchmarks/remat.md (5M: loses) and benchmarks/vitb_mfu.md (ViT-B,
    the bandwidth-bound shape the lever exists for).
    """
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def net_loss(p, x, tgt, k_drop):
        logits = model.apply(p, x, train=True, rngs={"dropout": k_drop})
        return optax.softmax_cross_entropy(
            logits.astype(jnp.float32), tgt).mean()

    if remat == "full":
        net_loss = jax.checkpoint(net_loss)
    elif remat == "dots":
        net_loss = jax.checkpoint(
            net_loss, policy=jax.checkpoint_policies.checkpoint_dots)
    elif remat == "dots_nb":
        net_loss = jax.checkpoint(
            net_loss,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    elif remat != "none":
        raise ValueError(f"unknown remat mode {remat!r}")

    def loss_fn(params, x_u8, y, rng):
        k_crop, k_flip, k_ra, k_er, k_mix, k_arb, k_drop = jax.random.split(rng, 7)
        x = pp.to_float(x_u8)
        x = pp.random_crop(k_crop, x, padding=x.shape[-1] // 8)
        x = pp.random_hflip(k_flip, x)
        if use_randaug:
            x = pp.rand_augment(k_ra, x, randaug_n, randaug_m)
        if random_erasing > 0:
            x = pp.random_erasing(k_er, x, p=random_erasing)
        x = pp.normalize(x, mean, std)
        tgt = pp.label_smoothing_onehot(y, n_classes, label_smoothing)
        if mixup_alpha > 0 and cutmix_alpha > 0:
            use_mix = jax.random.uniform(k_arb) < mix_prob
            x, tgt = jax.lax.cond(
                use_mix,
                lambda args: pp.mixup(k_mix, *args, alpha=mixup_alpha),
                lambda args: pp.cutmix(k_mix, *args, alpha=cutmix_alpha),
                (x, tgt),
            )
        elif mixup_alpha > 0:
            x, tgt = pp.mixup(k_mix, x, tgt, alpha=mixup_alpha)
        elif cutmix_alpha > 0:
            x, tgt = pp.cutmix(k_mix, x, tgt, alpha=cutmix_alpha)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            p = cast_floats(params, compute_dtype)
        else:
            p = params
        return net_loss(p, x, tgt, k_drop)

    def step(params, opt_state, x_u8, y, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, x_u8, y, rng)
        grads = cast_floats(grads, jnp.float32)
        if grad_clip is not None and grad_clip > 0:
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


def make_lm_train_step(model, tx, mesh, grad_clip: Optional[float] = None,
                       compute_dtype=jnp.bfloat16, accum_steps: int = 1):
    """Jitted data-parallel causal-LM train step (GPT family).

    step(params, opt_state, idx, targets, rng) -> (params, opt_state, metrics)

    ``accum_steps > 1``: gradient accumulation over sequentially-scanned
    microbatches (one optimizer update per call; activation memory of one
    microbatch). See ``make_classifier_train_step``.
    """
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def loss_fn(params, idx, targets, rng):
        p = cast_floats(params, compute_dtype) if compute_dtype is not None else params
        _, loss = model.apply(p, idx, targets=targets, train=True,
                              rngs={"dropout": rng})
        return loss.astype(jnp.float32)

    def _grads(params, idx, targets, rng):
        if accum_steps == 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                params, idx, targets, rng)
            return loss, cast_floats(grads, jnp.float32)
        b = idx.shape[0]
        if b % accum_steps != 0:
            raise ValueError(
                f"batch {b} not divisible by accum_steps {accum_steps}")
        mb = NamedSharding(mesh, P(None, DATA_AXIS))
        # interleaved split: device-local regroup (see classifier step)
        ilv = lambda a: a.reshape(b // accum_steps, accum_steps,
                                  *a.shape[1:]).swapaxes(0, 1)
        xs = jax.lax.with_sharding_constraint(ilv(idx), mb)
        ts = jax.lax.with_sharding_constraint(ilv(targets), mb)

        def body(carry, inp):
            g_acc, l_acc = carry
            xb, tb, i = inp
            l, g = jax.value_and_grad(loss_fn)(
                params, xb, tb, jax.random.fold_in(rng, i))
            g_acc = jax.tree_util.tree_map(
                lambda s, gg: s + gg.astype(jnp.float32), g_acc, g)
            return (g_acc, l_acc + l), None

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(jnp.shape(p), jnp.float32), params)
        (g, l), _ = jax.lax.scan(
            body, (zeros, jnp.float32(0.0)),
            (xs, ts, jnp.arange(accum_steps)))
        inv = 1.0 / accum_steps
        return l * inv, jax.tree_util.tree_map(lambda t: t * inv, g)

    def step(params, opt_state, idx, targets, rng):
        loss, grads = _grads(params, idx, targets, rng)
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
