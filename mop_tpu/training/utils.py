"""Training utilities (reference ``mop/training/utils.py``), JAX-native.

cosine_lr / set_seed / count_params plus checkpointing (orbax), AverageMeter,
EarlyStopping, and EMA — the semantic payload the reference stores.
"""

from __future__ import annotations

import functools
import math
import os
import pickle
import random
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def cosine_lr(base_lr: float, warmup_steps: int, total_steps: int):
    """Warmup (linear from 0) + cosine decay schedule, matching reference
    ``training/utils.py:15-32`` semantics. Returns step -> lr."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(1.0, total_steps - warmup_steps)
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = 0.5 * base_lr * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def set_seed(seed: int) -> jax.Array:
    """Seed python/numpy and return a JAX PRNG key (the JAX determinism story:
    functional PRNG instead of cudnn.deterministic, reference :35-51)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def count_params(params) -> int:
    """Count trainable parameters in a pytree (reference :54-64)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def print_model_info(name: str, params) -> None:
    n = count_params(params)
    print(f"{name}: {n:,} trainable params ({n / 1e6:.2f}M)")


def format_time(seconds: float) -> str:
    m, s = divmod(int(seconds), 60)
    h, m = divmod(m, 60)
    if h:
        return f"{h}h {m}m {s}s"
    if m:
        return f"{m}m {s}s"
    return f"{s}s"


def save_checkpoint(path: str, params, opt_state=None, epoch: int = 0,
                    loss: float = 0.0, extra=None):
    """Persist {epoch, params, opt_state, loss[, extra]} (reference
    :121-147 payload; ``extra`` carries e.g. an EMA shadow tree)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "epoch": epoch,
        "params": jax.device_get(params),
        "opt_state": jax.device_get(opt_state) if opt_state is not None else None,
        "loss": float(loss),
        "extra": jax.device_get(extra) if extra is not None else None,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_checkpoint_orbax(path: str, params, opt_state=None, step: int = 0):
    """Orbax checkpoint (async-capable, sharding-aware) — the production
    alternative to the pickle helpers. Payload mirrors the reference's
    {step, params, opt_state} semantics."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {"step": step, "params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, like=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)


def restore_checkpoint_sharded(path: str, like, shardings):
    """Restore an orbax checkpoint DIRECTLY into a distributed layout.

    ``like`` is a pytree matching the saved payload's structure (concrete or
    abstract values — only shape/dtype are read); ``shardings`` is a matching
    pytree of ``jax.sharding.Sharding`` (e.g. from ``fsdp_param_shardings``
    or ``tp_param_shardings``). Each array is loaded shard-by-shard onto its
    target devices without materializing the full tree on one host — and the
    target layout does NOT have to match the layout the checkpoint was saved
    under: save from an FSDP run, restore onto a TP mesh (or a different
    device count) and orbax reshards on read. This is the topology-change
    resume path; tests/test_sharded_checkpoint.py covers save->restore across
    fsdp/replicated/tp layouts plus resume-equivalence.
    """
    import orbax.checkpoint as ocp

    abstract = jax.tree_util.tree_map(
        lambda a, s: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a),
                                          sharding=s),
        like, shardings,
    )
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), abstract)


class AsyncCheckpointManager:
    """Non-blocking step-indexed checkpointing with retention.

    ``save(step, ...)`` returns as soon as the device->host copy is done;
    serialization streams to disk in a background thread while training
    continues (orbax async checkpointing). Long ImageNet-scale runs keep
    stepping through their checkpoint cadence instead of stalling on IO —
    the production upgrade of the reference's blocking ``torch.save``
    helpers (reference ``mop/training/utils.py:121-175``), which no script
    there even calls (SURVEY §5.4).

    - step-indexed directories under ``directory`` (resume picks
      ``latest_step()``);
    - ``keep`` most recent checkpoints are retained, older ones deleted;
    - sharding-aware: save from a multi-device run, restore into any layout
      via ``restore(..., shardings=...)`` (same orbax reshard-on-read path
      as :func:`restore_checkpoint_sharded`);
    - ``wait_until_finished()`` blocks on in-flight saves; ``close()``
      finalizes (also usable as a context manager).

    tests/test_async_checkpoint.py pins: overlap (a save is in flight while
    training steps), retention, latest-step resume equality, and
    cross-layout restore.
    """

    def __init__(self, directory: str, keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, enable_async_checkpointing=True),
        )

    def save(self, step: int, params, opt_state=None, extra=None) -> None:
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        if extra is not None:
            payload["extra"] = extra
        self._mgr.save(step, args=self._ocp.args.StandardSave(payload))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def restore(self, step: Optional[int] = None, like=None, shardings=None):
        """Restore ``step`` (default: latest). ``like`` is a pytree matching
        the saved payload ({'params': ..., ['opt_state': ...]}); with
        ``shardings`` (a matching pytree of ``jax.sharding.Sharding``) each
        array loads directly into the target distributed layout."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoints saved yet")
        if like is not None and shardings is not None:
            like = jax.tree_util.tree_map(
                lambda a, s: jax.ShapeDtypeStruct(
                    jnp.shape(a), jnp.result_type(a), sharding=s),
                like, shardings)
        args = self._ocp.args.StandardRestore(like) if like is not None \
            else None
        return self._mgr.restore(step, args=args)

    def is_saving(self) -> bool:
        """True while an async save is still streaming to disk."""
        return bool(self._mgr.is_saving_in_progress())

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class AverageMeter:
    """Running average tracker (reference :178-200)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(1, self.count)


class EarlyStopping:
    """Patience-based early stopping with best-weights restore (reference :203-249)."""

    def __init__(self, patience: int = 10, min_delta: float = 0.0, restore_best: bool = True):
        self.patience = patience
        self.min_delta = min_delta
        self.restore_best = restore_best
        self.best: Optional[float] = None
        self.best_params = None
        self.counter = 0
        self.should_stop = False

    def step(self, metric: float, params) -> bool:
        if self.best is None or metric > self.best + self.min_delta:
            self.best = metric
            self.counter = 0
            if self.restore_best:
                self.best_params = jax.device_get(params)
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop


@functools.partial(jax.jit, donate_argnums=0, static_argnums=2)
def ema_update(ema_params, params, decay: float):
    """Shadow-parameter EMA step (reference ``imagenet_ab_param_budgets.py:616-635``).

    Jitted with the EMA tree donated so the shadow updates in place.
    """
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )
