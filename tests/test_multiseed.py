"""Multi-seed vmapped training: each seed's trajectory must match an
independent single-seed run with the same rng/batches, and the seed-sharded
8-device layout must match the replicated one."""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mop_tpu.models import ViT_MoP
from mop_tpu.ops.preprocess import CIFAR10_MEAN, CIFAR10_STD
from mop_tpu.parallel import (
    make_mesh,
    make_multiseed_scanned_train_step,
    make_scanned_classifier_train_step,
    multiseed_init,
    multiseed_opt_init,
    replicate,
    seed_shardings,
    shard_batch,
    unstack_seed,
)
from mop_tpu.utils import jitted_init

K, B, SEEDS = 3, 16, [0, 1]


def _model():
    return ViT_MoP(dim=32, depth=2, heads=2, n_classes=10, n_views=2,
                   n_kernels=1, drop_path=0.0)


def _batches(n_seeds):
    x = np.random.RandomState(0).randint(0, 256, (K, n_seeds, B, 3, 32, 32),
                                         dtype=np.uint8)
    y = np.random.RandomState(1).randint(0, 10, (K, n_seeds, B)).astype(np.int32)
    return x, y


def _single_seed_run(seed, xk, yk, n_devices=1):
    """Oracle: the existing scanned single-seed step, same rng schedule."""
    mesh = make_mesh(n_devices=n_devices)
    model = _model()
    rng = jax.random.PRNGKey(seed)
    kp, kd = jax.random.split(rng)
    params = jitted_init(model, {"params": kp, "dropout": kd},
                         jnp.zeros((B, 3, 32, 32)), train=True)
    tx = optax.adamw(1e-3)
    opt = tx.init(params)
    with mesh:
        params, opt = replicate(params, mesh), replicate(opt, mesh)
        xb, yb = shard_batch((xk, yk), mesh)
        step = make_scanned_classifier_train_step(
            model, tx, mesh, CIFAR10_MEAN, CIFAR10_STD, unroll_steps=K,
            augment=True, compute_dtype=None)
        params, opt, m = step(params, opt, xb, yb, rng)
    return np.asarray(m["loss"]), jax.device_get(params)


def _multiseed_run(n_devices):
    mesh = make_mesh(n_devices=n_devices)
    model = _model()
    tx = optax.adamw(1e-3)
    params = multiseed_init(model, SEEDS, jnp.zeros((B, 3, 32, 32)))
    opt = multiseed_opt_init(tx, params)
    xk, yk = _batches(len(SEEDS))
    psh, bsh, rsh = seed_shardings(mesh, len(SEEDS))
    with mesh:
        params = jax.tree_util.tree_map(lambda a: jax.device_put(a, psh), params)
        opt = jax.tree_util.tree_map(lambda a: jax.device_put(a, psh), opt)
        xb = jax.device_put(xk, bsh)
        yb = jax.device_put(yk, bsh)
        rngs = jax.device_put(
            jnp.asarray([jax.random.PRNGKey(s) for s in SEEDS]), rsh)
        step = make_multiseed_scanned_train_step(
            model, tx, mesh, CIFAR10_MEAN, CIFAR10_STD,
            n_seeds=len(SEEDS), unroll_steps=K, augment=True,
            compute_dtype=None)
        params, opt, m = step(params, opt, xb, yb, rngs)
    return np.asarray(m["loss"]), jax.device_get(params)


def test_multiseed_matches_independent_runs():
    """Each seed's losses and final params match a solo run (fp32)."""
    loss_ms, params_ms = _multiseed_run(n_devices=1)
    xk, yk = _batches(len(SEEDS))
    for i, s in enumerate(SEEDS):
        loss_1, params_1 = _single_seed_run(s, xk[:, i], yk[:, i])
        np.testing.assert_allclose(loss_ms[:, i], loss_1, rtol=2e-5, atol=2e-6)
        p_i = unstack_seed(params_ms, i)
        for a, b in zip(jax.tree_util.tree_leaves(p_i),
                        jax.tree_util.tree_leaves(params_1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


def test_multiseed_seeds_differ():
    """Different seeds must actually produce different trajectories."""
    loss_ms, _ = _multiseed_run(n_devices=1)
    assert not np.allclose(loss_ms[:, 0], loss_ms[:, 1])


def test_multiseed_seed_sharded_matches_replicated():
    """S=2 on 2 devices (seed axis sharded over ICI, zero collectives)
    matches the single-device stacked run."""
    loss_1, params_1 = _multiseed_run(n_devices=1)
    loss_2, params_2 = _multiseed_run(n_devices=2)
    np.testing.assert_allclose(loss_1, loss_2, rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(params_1),
                    jax.tree_util.tree_leaves(params_2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_seed_shardings_layouts():
    mesh = make_mesh(n_devices=8)
    psh, bsh, _ = seed_shardings(mesh, 8)  # divisible: seed axis sharded
    assert psh.spec == jax.sharding.PartitionSpec("data")
    assert bsh.spec == jax.sharding.PartitionSpec(None, "data")
    psh, bsh, _ = seed_shardings(mesh, 3)  # non-divisible: replicated seeds
    assert psh.spec == jax.sharding.PartitionSpec()
    assert bsh.spec == jax.sharding.PartitionSpec(None, None, "data")
