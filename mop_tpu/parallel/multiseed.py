"""Device-parallel multi-seed training: S independent replicas in ONE step.

The reference runs its seed studies as a serial host loop — one full
training run per seed (``experiments/cifar100_multi_seed.py:164``,
``cifar100_ab5_param_budgets.py:679``, ``ab5_tournament.py:390``). On TPU the seeds are
embarrassingly parallel: stacking params/opt-state/rng on a leading seed
axis and ``jax.vmap``-ing the train step turns S runs into one compiled
program whose matmuls are S-fold batched (recovering MXU utilization that a
single small model leaves on the table) and whose compile + dispatch cost is
paid once instead of S times.

Sharding: when S divides the mesh's data axis, the SEED axis itself is
sharded over ICI — each chip trains S/n_chips whole seeds with ZERO gradient
collectives (seed-parallelism replaces data-parallelism). Otherwise the seed
axis is replicated and the per-seed batch axis is sharded as usual (XLA
inserts one gradient all-reduce per seed, fused as ever).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import preprocess as pp
from .mesh import DATA_AXIS
from .train_step import cast_floats

Array = jax.Array


def multiseed_init(model, seeds, x_example, train: bool = True):
    """Stacked init: one parameter pytree with a leading seed axis.

    ``seeds`` is a list/array of ints (or a stacked (S, 2) PRNGKey array).
    Every seed gets its own independent initialization, exactly as S separate
    ``model.init(PRNGKey(seed), ...)`` calls would.
    """
    if not hasattr(seeds, "dtype"):
        seeds = jnp.asarray([jax.random.PRNGKey(int(s)) for s in seeds])

    def init_one(key):
        kp, kd = jax.random.split(key)
        return model.init({"params": kp, "dropout": kd}, x_example, train=train)

    return jax.jit(jax.vmap(init_one))(seeds)


def multiseed_opt_init(tx: optax.GradientTransformation, stacked_params):
    """Per-seed optimizer states for a stacked parameter tree."""
    return jax.jit(jax.vmap(tx.init))(stacked_params)


def unstack_seed(tree, i: int):
    """Extract seed ``i``'s slice from a stacked pytree (host or device)."""
    return jax.tree_util.tree_map(lambda a: a[i], tree)


def seed_shardings(mesh, n_seeds: int):
    """(param/opt sharding, (K,S,B,...) batch sharding, (S,...) rng sharding).

    Seed axis sharded over the data axis when divisible; else replicated
    seeds + per-seed batch axis sharded.
    """
    n_data = mesh.shape[DATA_AXIS]
    if n_seeds % n_data == 0 and n_data > 1:
        return (
            NamedSharding(mesh, P(DATA_AXIS)),
            NamedSharding(mesh, P(None, DATA_AXIS)),
            NamedSharding(mesh, P(DATA_AXIS)),
        )
    return (
        NamedSharding(mesh, P()),
        NamedSharding(mesh, P(None, None, DATA_AXIS)),
        NamedSharding(mesh, P()),
    )


def make_multiseed_scanned_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh,
    mean,
    std,
    n_seeds: int,
    unroll_steps: int,
    augment: bool = True,
    label_smoothing: float = 0.0,
    grad_clip: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
):
    """K train steps for S seeds in ONE dispatch: ``lax.scan`` over a
    (K, S, B, ...) super-batch with the per-seed step ``vmap``-ed over S.

    Returns ``step(params, opt_state, x_u8 (K,S,B,C,H,W), y (K,S,B),
    rngs (S,2)) -> (params, opt_state, {'loss': (K,S), 'acc': (K,S)})``
    where params/opt_state carry a leading seed axis
    (from :func:`multiseed_init` / :func:`multiseed_opt_init`).

    Per-seed semantics are identical to
    :func:`make_scanned_classifier_train_step`: same rng split schedule,
    same augment -> bf16 fwd/bwd -> AdamW update. Seed s of a multiseed run
    and a single-seed run started from ``PRNGKey``/batches of seed s produce
    the same trajectory (up to batched-matmul reduction order; see
    tests/test_multiseed.py).
    """
    psh, bsh, rsh = seed_shardings(mesh, n_seeds)

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
        if label_smoothing > 0.0:
            tgt = pp.label_smoothing_onehot(y, logits.shape[-1], label_smoothing)
            loss = optax.softmax_cross_entropy(logits, tgt).mean()
        else:
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return loss, acc

    def one_seed_step(params, opt_state, rng, x_u8, y):
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
        return params, opt_state, rng, loss, acc

    v_step = jax.vmap(one_seed_step)

    def scan_body(carry, batch):
        params, opt_state, rngs = carry
        x_u8, y = batch
        params, opt_state, rngs, loss, acc = v_step(params, opt_state, rngs,
                                                    x_u8, y)
        return (params, opt_state, rngs), (loss, acc)

    def step(params, opt_state, x_u8, y, rngs):
        (params, opt_state, _), (losses, accs) = jax.lax.scan(
            scan_body, (params, opt_state, rngs), (x_u8, y))
        return params, opt_state, {"loss": losses, "acc": accs}

    if psh.spec == P(DATA_AXIS):
        # Seed-sharded layout: the whole per-seed program is local to its
        # chip, so run it under shard_map (manual partitioning, zero
        # collectives) instead of GSPMD — GSPMD cannot partition the
        # vmapped depthwise gate convs along the seed axis (it folds the
        # seed axis into feature_group_count and then cannot split the
        # groups evenly across devices).
        msh = NamedSharding(mesh, P(None, DATA_AXIS))
        step = jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(None, DATA_AXIS),
                      P(None, DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(None, DATA_AXIS)),
            check_vma=False,
        )
    else:
        msh = NamedSharding(mesh, P())

    return jax.jit(
        step,
        in_shardings=(psh, psh, bsh, bsh, rsh),
        out_shardings=(psh, psh, msh),
        donate_argnums=(0, 1),
    )
