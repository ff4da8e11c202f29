"""Sharding correctness: the 8-device data-parallel step must match the
single-device computation (XLA inserts the gradient all-reduce)."""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mop_tpu.models import ViT_MoP
from mop_tpu.ops.preprocess import CIFAR10_MEAN, CIFAR10_STD
from mop_tpu.parallel import (
    make_classifier_eval_step,
    make_classifier_train_step,
    make_mesh,
    replicate,
    shard_batch,
)


def _train_some(n_devices, steps=3, batch=16):
    mesh = make_mesh(n_devices=n_devices)
    model = ViT_MoP(dim=32, depth=2, heads=2, n_classes=10, n_views=2,
                    n_kernels=1, drop_path=0.0)
    rng = jax.random.PRNGKey(0)
    x_u8 = np.random.RandomState(0).randint(0, 256, (batch, 3, 32, 32),
                                            dtype=np.uint8)
    y = np.random.RandomState(1).randint(0, 10, (batch,)).astype(np.int32)
    params = model.init({"params": rng, "dropout": rng},
                        jnp.zeros((batch, 3, 32, 32)), train=True)
    tx = optax.adamw(1e-3)
    opt = tx.init(params)
    with mesh:
        params = replicate(params, mesh)
        opt = replicate(opt, mesh)
        xb, yb = shard_batch((x_u8, y), mesh)
        # fp32 compute for exact cross-device comparison; no dropout rngs vary
        step = make_classifier_train_step(
            model, tx, mesh, CIFAR10_MEAN, CIFAR10_STD, augment=False,
            compute_dtype=None,
        )
        losses = []
        for i in range(steps):
            params, opt, m = step(params, opt, xb, yb, jax.random.fold_in(rng, i))
            losses.append(float(m["loss"]))
    return losses, jax.device_get(params)


def test_dp8_matches_single_device():
    l1, p1 = _train_some(1)
    l8, p8 = _train_some(8)
    np.testing.assert_allclose(l1, l8, rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_eval_step_sharded_counts():
    mesh = make_mesh(n_devices=8)
    model = ViT_MoP(dim=32, depth=2, heads=2, n_classes=10, n_views=2,
                    n_kernels=1, drop_path=0.0)
    rng = jax.random.PRNGKey(0)
    batch = 16
    params = model.init(rng, jnp.zeros((batch, 3, 32, 32)))
    x_u8 = np.random.RandomState(0).randint(0, 256, (batch, 3, 32, 32),
                                            dtype=np.uint8)
    y = np.random.RandomState(1).randint(0, 10, (batch,)).astype(np.int32)
    mask = np.ones(batch, np.float32)
    mask[-3:] = 0.0  # padded tail
    with mesh:
        params = replicate(params, mesh)
        ev = make_classifier_eval_step(model, mesh, CIFAR10_MEAN, CIFAR10_STD,
                                       compute_dtype=None)
        correct, total = ev(params, *shard_batch((x_u8, y, mask), mesh))
    assert float(total) == batch - 3
    assert 0.0 <= float(correct) <= batch - 3


def test_make_mesh_raises_on_device_shortfall():
    """Requesting more devices than exist must raise, never silently truncate
    (a truncated mesh fakes multi-chip validation on fewer chips)."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_devices=16"):
        make_mesh(n_devices=16)  # host has 8 virtual CPU devices


def test_checkpoint_roundtrip(tmp_path):
    from mop_tpu.training import load_checkpoint, save_checkpoint

    model = ViT_MoP(dim=32, depth=2, heads=2, n_classes=10, n_views=2, n_kernels=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))
    path = str(tmp_path / "ckpt.pkl")
    save_checkpoint(path, params, opt_state=None, epoch=3, loss=1.25)
    payload = load_checkpoint(path)
    assert payload["epoch"] == 3 and payload["loss"] == 1.25
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(payload["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nan_guard_detects_and_passes():
    from mop_tpu.utils.debug import check_finite, guard_nans, tree_isfinite
    import pytest as _pytest

    good = {"a": jnp.ones((3,)), "b": jnp.zeros((2, 2))}
    bad = {"a": jnp.asarray([1.0, jnp.nan]), "b": jnp.ones(())}
    assert bool(tree_isfinite(good))
    assert not bool(tree_isfinite(bad))

    step = guard_nans(lambda x: x * 2)
    out, flag = step(jnp.ones(3))
    check_finite(flag)  # no raise
    out, flag = step(jnp.asarray([jnp.inf]))
    with _pytest.raises(FloatingPointError):
        check_finite(flag, "unit test")


def test_scanned_train_step_runs_and_learns():
    from mop_tpu.parallel import make_scanned_classifier_train_step

    mesh = make_mesh(n_devices=8)
    model = ViT_MoP(dim=32, depth=2, heads=2, n_classes=10, n_views=2,
                    n_kernels=1, drop_path=0.0)
    rng = jax.random.PRNGKey(0)
    K, batch = 4, 16
    xk = np.random.RandomState(0).randint(0, 256, (K, batch, 3, 32, 32),
                                          dtype=np.uint8)
    yk = np.random.RandomState(1).randint(0, 10, (K, batch)).astype(np.int32)
    params = model.init({"params": rng, "dropout": rng},
                        jnp.zeros((batch, 3, 32, 32)), train=True)
    tx = optax.adamw(1e-3)
    opt = tx.init(params)
    with mesh:
        params = replicate(params, mesh)
        opt = replicate(opt, mesh)
        xkb = jax.device_put(xk, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "data")))
        ykb = jax.device_put(yk, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "data")))
        step = make_scanned_classifier_train_step(
            model, tx, mesh, CIFAR10_MEAN, CIFAR10_STD, unroll_steps=K,
            augment=False, compute_dtype=None)
        losses = []
        for i in range(4):
            params, opt, m = step(params, opt, xkb, ykb,
                                  jax.random.fold_in(rng, i))
            losses.extend(float(v) for v in np.asarray(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # 16 effective steps on repeated data learn


def test_scanned_step_remat_modes_match():
    """remat='full'/'dots' recompute the identical math — losses and updated
    params must match the no-remat step to float tolerance."""
    import numpy as np
    import optax

    from mop_tpu.models import ViT_Baseline
    from mop_tpu.parallel import (make_mesh,
                                  make_scanned_classifier_train_step,
                                  replicate, shard_batch)

    model = ViT_Baseline(n_classes=10, dim=32, depth=2, heads=2)
    rng = jax.random.PRNGKey(0)
    K, batch = 2, 16
    xk = np.random.RandomState(0).randint(0, 256, (K, batch, 3, 32, 32),
                                          dtype=np.uint8)
    yk = np.random.RandomState(1).randint(0, 10, (K, batch)).astype(np.int32)
    params0 = jax.tree_util.tree_map(np.asarray, model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((batch, 3, 32, 32)), train=True))
    tx = optax.adamw(1e-3)
    mesh = make_mesh(n_devices=1)
    outs = {}
    with mesh:
        xkb, ykb = shard_batch((xk, yk), mesh)
        for mode in ("none", "full", "dots"):
            p = replicate(params0, mesh)
            o = replicate(tx.init(params0), mesh)
            step = make_scanned_classifier_train_step(
                model, tx, mesh, (0.5, 0.5, 0.5), (0.25, 0.25, 0.25),
                unroll_steps=K, augment=True, compute_dtype=None,
                remat=mode)
            p, o, m = step(p, o, xkb, ykb, rng)
            outs[mode] = (np.asarray(m["loss"]),
                          jax.tree_util.tree_map(np.asarray, p))
    for mode in ("full", "dots"):
        np.testing.assert_allclose(outs[mode][0], outs["none"][0],
                                   rtol=1e-6, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(outs[mode][1]),
                        jax.tree_util.tree_leaves(outs["none"][1])):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
