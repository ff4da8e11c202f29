"""Sharded (orbax) checkpointing: save from one distributed layout, restore
into another, and resume training bit-compatibly.

The production checkpoint path for the FSDP/TP modes: arrays are written
shard-aware and restored directly into the target sharding — including a
DIFFERENT layout than the one they were saved under (topology-change
resume). Runs on the 8-virtual-CPU-device mesh from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mop_tpu.models import ViT_MoP
from mop_tpu.ops.preprocess import CIFAR100_MEAN, CIFAR100_STD
from mop_tpu.parallel import (
    fsdp_init_opt_state,
    fsdp_param_shardings,
    fsdp_shard_params,
    make_fsdp_classifier_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from mop_tpu.parallel.mesh import replicated
from mop_tpu.parallel.tp import tp_param_shardings
from mop_tpu.training.utils import (
    restore_checkpoint_sharded,
    save_checkpoint_orbax,
)

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

MIN_SIZE = 256


def _setup(batch=16):
    model = ViT_MoP(dim=64, depth=2, heads=4, n_classes=10, n_views=3,
                    n_kernels=2, drop_path=0.0)
    rng = jax.random.PRNGKey(0)
    x = np.random.RandomState(0).randint(0, 256, (batch, 3, 32, 32),
                                         dtype=np.uint8)
    y = np.random.RandomState(1).randint(0, 10, (batch,)).astype(np.int32)
    params = jax.tree_util.tree_map(
        np.asarray,
        model.init({"params": rng, "dropout": rng},
                   jnp.zeros((batch, 3, 32, 32)), train=True))
    tx = optax.adamw(1e-3)
    return model, params, tx, x, y, rng


@requires_8
def test_save_fsdp_restore_fsdp_and_resume(tmp_path):
    """Save mid-training from an FSDP run; restoring params+opt_state and
    continuing must match the uninterrupted run exactly."""
    model, params, tx, x, y, rng = _setup()
    mesh = make_mesh(n_devices=8)
    with mesh:
        p = fsdp_shard_params(params, mesh, min_size=MIN_SIZE)
        o = fsdp_init_opt_state(tx, params, mesh, min_size=MIN_SIZE)
        xb, yb = shard_batch((x, y), mesh)
        step = make_fsdp_classifier_train_step(
            model, tx, mesh, CIFAR100_MEAN, CIFAR100_STD,
            augment=False, compute_dtype=None, min_size=MIN_SIZE)
        for i in range(2):
            p, o, _ = step(p, o, xb, yb, jax.random.fold_in(rng, i))
        save_checkpoint_orbax(str(tmp_path / "ckpt"), p, opt_state=o, step=2)

        # Uninterrupted: two more steps.
        p_ref, o_ref = p, o
        for i in range(2, 4):
            p_ref, o_ref, m_ref = step(p_ref, o_ref, xb, yb,
                                       jax.random.fold_in(rng, i))

        # Resume: restore into the same FSDP layout, run the same two steps.
        from jax.sharding import NamedSharding

        from mop_tpu.parallel.fsdp import fsdp_spec

        psh = fsdp_param_shardings(params, mesh, min_size=MIN_SIZE)
        state_like = jax.eval_shape(tx.init, params)
        # Opt-state shardings: same rule applied leaf-wise.
        osh = jax.tree_util.tree_map(
            lambda a: NamedSharding(
                mesh, fsdp_spec(a.shape, 8, MIN_SIZE)), state_like)
        restored = restore_checkpoint_sharded(
            str(tmp_path / "ckpt"),
            {"step": 0, "params": params, "opt_state": state_like},
            {"step": NamedSharding(mesh, jax.sharding.PartitionSpec()),
             "params": psh, "opt_state": osh},
        )
        assert int(restored["step"]) == 2
        p2, o2 = restored["params"], restored["opt_state"]
        k = p2["params"]["enc"]["blocks_0"]["attn"]["qkv"]["kernel"]
        assert k.addressable_shards[0].data.shape[1] == k.shape[1] // 8, \
            "restore did not land in the FSDP layout"
        # optax state trees restore as plain dicts/lists; rebuild the
        # original NamedTuple structure from the restored leaves.
        o2 = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state_like),
            jax.tree_util.tree_leaves(o2))
        for i in range(2, 4):
            p2, o2, m2 = step(p2, o2, xb, yb, jax.random.fold_in(rng, i))

    np.testing.assert_array_equal(
        np.asarray(m2["loss"]), np.asarray(m_ref["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@requires_8
def test_save_fsdp_restore_other_layouts(tmp_path):
    """A checkpoint saved under FSDP restores into replicated and TP layouts
    with identical values — the topology-change path."""
    model, params, tx, x, y, rng = _setup()
    mesh = make_mesh(n_devices=8)
    with mesh:
        p = fsdp_shard_params(params, mesh, min_size=MIN_SIZE)
        save_checkpoint_orbax(str(tmp_path / "ckpt"), p, step=0)

        # Restore replicated on the same mesh.
        rep_sh = jax.tree_util.tree_map(lambda _: replicated(mesh), params)
        r1 = restore_checkpoint_sharded(
            str(tmp_path / "ckpt"),
            {"step": 0, "params": params},
            {"step": replicated(mesh), "params": rep_sh})
        ln = r1["params"]["params"]["enc"]["blocks_0"]["ln1"]["scale"]
        assert ln.addressable_shards[0].data.shape == ln.shape

    # Restore onto a DIFFERENT mesh shape (dp=4 x tp=2) with TP shardings.
    mesh2 = make_mesh(n_devices=8, model_parallel=2)
    with mesh2:
        tp_sh = tp_param_shardings(params, mesh2)
        r2 = restore_checkpoint_sharded(
            str(tmp_path / "ckpt"),
            {"step": 0, "params": params},
            {"step": replicated(mesh2), "params": tp_sh})
        qkv = r2["params"]["params"]["enc"]["blocks_0"]["attn"]["qkv"]["kernel"]
        assert qkv.addressable_shards[0].data.shape[1] == qkv.shape[1] // 2, \
            "restore did not land in the TP layout"

    for a, b, c in zip(jax.tree_util.tree_leaves(params),
                       jax.tree_util.tree_leaves(r1["params"]),
                       jax.tree_util.tree_leaves(r2["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
