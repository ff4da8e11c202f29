"""ImageNet-style train step: full regularization suite in one jit (CPU mesh)."""

# Slow lane: excluded from the default `pytest` run (see CONTRIBUTING.md / tests/TIMINGS.md)
pytestmark = __import__("pytest").mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mop_tpu.models import ViT_Baseline
from mop_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD
from mop_tpu.parallel import (
    make_imagenet_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from mop_tpu.training.utils import ema_update


def test_imagenet_step_with_all_regularizers():
    mesh = make_mesh(n_devices=8)
    model = ViT_Baseline(dim=32, depth=2, heads=2, n_classes=10, patch=16,
                         img_size=32, drop_path=0.1)
    rng = jax.random.PRNGKey(0)
    batch = 16
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
        ema = jax.tree_util.tree_map(jnp.copy, params)
        xb, yb = shard_batch((x_u8, y), mesh)
        step = make_imagenet_train_step(
            model, tx, mesh, IMAGENET_MEAN, IMAGENET_STD, n_classes=10,
            label_smoothing=0.1, use_randaug=True, random_erasing=0.25,
            mixup_alpha=0.8, cutmix_alpha=1.0, mix_prob=0.5, grad_clip=1.0,
        )
        losses = []
        for i in range(3):
            params, opt, m = step(params, opt, xb, yb, jax.random.fold_in(rng, i))
            ema = ema_update(ema, params, 0.5)
            losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    # EMA drifted toward params but is not identical after 3 steps at 0.5 decay
    pa = jax.tree_util.tree_leaves(params)[0]
    ea = jax.tree_util.tree_leaves(ema)[0]
    assert not np.allclose(np.asarray(pa), np.asarray(ea), atol=0)
