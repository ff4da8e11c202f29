"""Generic epoch-based trainer (reference ``mop/training/trainer.py``), JAX-native.

The reference trainer auto-selects a device, optionally torch.compiles, and
runs epoch loops with AMP bf16. The TPU equivalent: pjit-compiled sharded
train/eval steps over a device mesh with bf16 compute, plus the same public
surface (``Trainer.train_epoch`` / ``evaluate`` / ``train_model``) returning
the same metric dict shapes.
"""

from __future__ import annotations

import time
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.preprocess import CIFAR10_MEAN, CIFAR10_STD
from ..parallel import (
    make_classifier_eval_step,
    make_classifier_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from ..utils import jitted_init
from .utils import cosine_lr, count_params


class Trainer:
    """Trainer for MoP image classifiers on a device mesh.

    Mirrors reference ``trainer.py:16-131``; `use_amp` maps to bf16 compute,
    `compile_model` is implicit (everything is jit-compiled).
    """

    def __init__(
        self,
        model,
        mesh=None,
        use_amp: bool = True,
        mean=CIFAR10_MEAN,
        std=CIFAR10_STD,
        augment: bool = True,
        grad_clip: Optional[float] = None,
    ):
        self.model = model
        self.mesh = mesh or make_mesh()
        self.compute_dtype = jnp.bfloat16 if use_amp else None
        self.mean, self.std = mean, std
        self.augment = augment
        self.grad_clip = grad_clip
        self._train_step = None
        self._eval_step = None
        self._tx = None

    def init(self, rng, sample_shape=(2, 3, 32, 32)):
        x = jnp.zeros(sample_shape, jnp.float32)
        params = jitted_init(self.model, {"params": rng, "dropout": rng}, x, train=True)
        return replicate(params, self.mesh)

    def setup_optimizer(self, tx: optax.GradientTransformation, params):
        self._tx = tx
        opt_state = replicate(tx.init(params), self.mesh)
        self._train_step = make_classifier_train_step(
            self.model, tx, self.mesh, self.mean, self.std,
            augment=self.augment, grad_clip=self.grad_clip,
            compute_dtype=self.compute_dtype,
        )
        # Eval always fp32: accuracy stats must not pick up bf16 argmax flips.
        self._eval_step = make_classifier_eval_step(
            self.model, self.mesh, self.mean, self.std,
            compute_dtype=None,
        )
        return opt_state

    def train_epoch(
        self,
        params,
        opt_state,
        train_batches: Iterable,
        rng,
        steps_per_epoch: int,
        epoch: int = 1,
        total_epochs: int = 1,
        log_interval: int = 100,
    ):
        """One epoch: returns (params, opt_state, metrics dict)."""
        total_loss, total_acc, seen = 0.0, 0.0, 0
        it = iter(train_batches)
        with self.mesh:
            for step_i in range(steps_per_epoch):
                xb, yb = next(it)
                xb, yb = shard_batch((np.asarray(xb), np.asarray(yb)), self.mesh)
                key = jax.random.fold_in(rng, epoch * 100_000 + step_i)
                params, opt_state, m = self._train_step(params, opt_state, xb, yb, key)
                total_loss += float(m["loss"])
                total_acc += float(m["acc"])
                seen += 1
                if log_interval and step_i % log_interval == 0:
                    print(
                        f"Epoch {epoch}/{total_epochs} step {step_i}/{steps_per_epoch} "
                        f"loss {float(m['loss']):.6f}"
                    )
        return params, opt_state, {
            "loss": total_loss / max(1, seen),
            "accuracy": 100.0 * total_acc / max(1, seen),
        }

    def evaluate(self, params, eval_batches: Iterable) -> Dict[str, float]:
        """Full-set accuracy under padding masks (reference :105-131)."""
        correct, total = 0.0, 0.0
        with self.mesh:
            for xb, yb, mb in eval_batches:
                xb, yb, mb = shard_batch(
                    (np.asarray(xb), np.asarray(yb), np.asarray(mb)), self.mesh
                )
                c, t = self._eval_step(params, xb, yb, mb)
                correct += float(c)
                total += float(t)
        acc = 100.0 * correct / max(1.0, total)
        return {"accuracy": acc, "correct": correct, "total": total}


def train_model(
    model,
    train_iter,
    val_batches_fn,
    steps: int,
    batch_size: int = 128,
    lr: float = 3e-3,
    weight_decay: float = 0.05,
    warmup_frac: float = 0.05,
    eval_every: int = 0,
    seed: int = 0,
    mesh=None,
    mean=CIFAR10_MEAN,
    std=CIFAR10_STD,
    augment: bool = True,
    grad_clip: Optional[float] = None,
    verbose: bool = True,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 0,
    resume: bool = False,
):
    """Step-based training run (reference ``trainer.py:133-235`` adapted to the
    experiments' step-count convention). Returns (params, history dict).

    With ``ckpt_dir``: async checkpoints every ``ckpt_every`` steps, and
    the run is preemption-safe — SIGTERM (the TPU-VM spot/maintenance
    signal) checkpoints at the next step boundary and exits with code 75
    so a relaunch with ``resume=True`` continues from the saved step
    (the reference just dies, SURVEY §5.3).
    """
    rng = jax.random.PRNGKey(seed)
    trainer = Trainer(
        model, mesh=mesh, mean=mean, std=std, augment=augment, grad_clip=grad_clip
    )
    params = trainer.init(rng)
    warmup = max(1, int(steps * warmup_frac))
    sched = cosine_lr(lr, warmup, steps)
    tx = optax.adamw(sched, weight_decay=weight_decay)
    opt_state = trainer.setup_optimizer(tx, params)

    start_step, mgr, guard = 0, None, None
    if ckpt_dir:
        from .preemption import PreemptionGuard, resume_latest
        from .utils import AsyncCheckpointManager

        mgr = AsyncCheckpointManager(ckpt_dir, keep=2)
        guard = PreemptionGuard(mgr).install()
        if resume:
            start_step, params, opt_state = resume_latest(mgr, params, opt_state)
            if start_step and verbose:
                print(f"resumed from step {start_step}")

    history = {"train_loss": [], "val_acc": [], "time_min": []}
    best_acc, t0 = 0.0, time.time()
    try:
        with trainer.mesh:
            for step_i in range(start_step, steps):
                xb, yb = next(train_iter)
                xb, yb = shard_batch((np.asarray(xb), np.asarray(yb)), trainer.mesh)
                key = jax.random.fold_in(rng, step_i)
                params, opt_state, m = trainer._train_step(params, opt_state, xb, yb, key)
                if verbose and step_i % 100 == 0:
                    print(f"step {step_i}/{steps} loss {float(m['loss']):.4f}")
                history["train_loss"].append(float(m["loss"]))
                if eval_every and (step_i + 1) % eval_every == 0:
                    acc = trainer.evaluate(params, val_batches_fn())["accuracy"]
                    history["val_acc"].append(acc)
                    best_acc = max(best_acc, acc)
                    if verbose:
                        print(f"  val acc {acc:.2f}% (best {best_acc:.2f}%)")
                if mgr is not None and ckpt_every and (step_i + 1) % ckpt_every == 0:
                    mgr.save(step_i + 1, params, opt_state=opt_state)
                if guard is not None:
                    # float(m['loss']) above already forced the step; the
                    # guard re-saves synchronously before exiting 75
                    guard.maybe_checkpoint_and_exit(
                        step_i + 1, params, opt_state=opt_state)
    finally:
        if guard is not None:
            guard.uninstall()
        if mgr is not None:
            mgr.close()
    history["time_min"].append((time.time() - t0) / 60.0)
    return params, history
