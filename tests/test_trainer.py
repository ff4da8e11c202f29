"""Trainer class surface (reference mop/training/trainer.py contract)."""

import jax
import numpy as np
import optax

from mop_tpu.data import BatchIterator, eval_batches, synthetic_cifar
from mop_tpu.models import ViT_MoP
from mop_tpu.training import Trainer


def test_trainer_epoch_and_evaluate():
    tr_x, tr_y, te_x, te_y = synthetic_cifar("cifar10", 512, 128, seed=0)
    model = ViT_MoP(dim=32, depth=2, heads=2, n_classes=10, n_views=2,
                    n_kernels=1, drop_path=0.0)
    trainer = Trainer(model, grad_clip=1.0, use_amp=False)
    rng = jax.random.PRNGKey(0)
    params = trainer.init(rng, (32, 3, 32, 32))
    opt_state = trainer.setup_optimizer(optax.adamw(1e-3), params)
    it = BatchIterator(tr_x, tr_y, 32, seed=0)
    params, opt_state, metrics = trainer.train_epoch(
        params, opt_state, it, rng, steps_per_epoch=10, log_interval=0)
    assert np.isfinite(metrics["loss"]) and 0 <= metrics["accuracy"] <= 100
    ev = trainer.evaluate(params, eval_batches(te_x, te_y, 32))
    assert ev["total"] == len(te_x)
    assert 0 <= ev["accuracy"] <= 100
