"""Shared experiment machinery for the mop-tpu CLI surface.

The reference duplicates this logic across ~15 scripts (param matching in
``cifar100_ab5_param_budgets.py:165-325``, loaders :107-162, make_opt
:464-479, lockstep loop :789-823, CSV emission :841-918). Here it is one
engine; each script keeps its reference-identical argparse flags and output
contract.

JAX-specific improvements over the reference:
- ``estimate_params`` uses ``jax.eval_shape`` (abstract init) so the budget
  grid search never materializes weights (the reference instantiates dozens of
  throwaway torch models per search).
- Training runs as per-model jitted data-parallel steps over a device mesh
  with on-device augmentation and bf16 compute.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from mop_tpu.data import BatchIterator, eval_batches, load_cifar, train_val_split
from mop_tpu.utils import jitted_init
from mop_tpu.ops.preprocess import (
    CIFAR10_MEAN,
    CIFAR10_STD,
    CIFAR100_MEAN,
    CIFAR100_STD,
)
from mop_tpu.parallel import (
    make_classifier_eval_step,
    make_classifier_train_step,
    make_mesh,
    replicate,
    shard_batch,
)


def set_seed(seed: int) -> jax.Array:
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def get_device_str() -> str:
    d = jax.devices()[0]
    return f"{d.platform}:{d.device_kind} x{len(jax.devices())}"


# ----------------------------- data -----------------------------


def get_loaders(
    dataset: str,
    batch: int,
    tiny: bool = False,
    val_frac: float = 0.1,
    val_seed: int = 0,
    synthetic: bool = False,
    seed: int = 0,
    download: bool = False,
):
    """Train iterator + val/test eval-batch factories (reference :107-162).

    Returns (train_iter_factory(seed), val_batches_fn, test_batches_fn,
    mean, std, n_classes).
    """
    name = "cifar10" if dataset == "cifar10" else "cifar100"
    mean, std = (CIFAR10_MEAN, CIFAR10_STD) if name == "cifar10" else (
        CIFAR100_MEAN, CIFAR100_STD)
    n_classes = 10 if name == "cifar10" else 100
    tr_x, tr_y, te_x, te_y = load_cifar(name, synthetic=synthetic,
                                    download=download)
    if tiny:
        tr_x, tr_y = tr_x[:2000], tr_y[:2000]
        te_x, te_y = te_x[:1000], te_y[:1000]
    if val_frac > 0:
        tr_x, tr_y, va_x, va_y = train_val_split(tr_x, tr_y, val_frac, val_seed)
    else:
        va_x, va_y = te_x, te_y

    def train_iter(seed_=0):
        try:
            from mop_tpu.data import native_loader
            if native_loader.is_available():
                return native_loader.NativeBatchIterator(
                    tr_x, tr_y, batch, seed=seed_)
        except Exception:
            pass
        return BatchIterator(tr_x, tr_y, batch, seed=seed_)

    def val_batches():
        return eval_batches(va_x, va_y, batch)

    def test_batches():
        return eval_batches(te_x, te_y, batch)

    return train_iter, val_batches, test_batches, mean, std, n_classes


# ----------------------- parameter matching -----------------------


def count_parameters(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


_ESTIMATE_CACHE: Dict = {}


def estimate_params(
    ctor,
    n_classes: int,
    dim: int,
    depth: int,
    heads: int,
    extra_kwargs: Optional[Dict] = None,
    img_size: int = 32,
) -> int:
    """Abstract-init param count (reference :182-194, minus the throwaway
    instantiation cost — eval_shape only traces). Memoized: the edgewise
    fallback ladder re-queries the same candidates many times."""
    key = (ctor, n_classes, dim, depth, heads, img_size,
           tuple(sorted((extra_kwargs or {}).items(),
                        key=lambda kv: kv[0])).__repr__())
    if key in _ESTIMATE_CACHE:
        return _ESTIMATE_CACHE[key]
    kwargs = dict(dim=dim, depth=depth, heads=heads, n_classes=n_classes)
    if extra_kwargs:
        kwargs.update(extra_kwargs)
    model = ctor(**kwargs)
    x = jax.ShapeDtypeStruct((1, 3, img_size, img_size), jnp.float32)
    tree = jax.eval_shape(
        lambda xx: model.init(jax.random.PRNGKey(0), xx), x
    )
    n = count_parameters(tree)
    _ESTIMATE_CACHE[key] = n
    return n


def find_config_for_target(
    ctor,
    n_classes: int,
    target_params: int,
    dims: Iterable[int] = (128, 160, 192, 224, 256, 320, 384, 448, 512, 640, 768),
    depths: Iterable[int] = (6, 8, 10, 12),
    heads_list: Iterable[int] = (4, 6, 8),
    extra_kwargs: Optional[Dict] = None,
    img_size: int = 32,
) -> Tuple[Dict[str, int], int]:
    """Grid search minimizing |target - params| (reference :196-227)."""
    best_diff, best_cfg, best_params = None, None, None
    for heads in heads_list:
        for dim in dims:
            if dim % heads != 0:
                continue
            for depth in depths:
                try:
                    p = estimate_params(
                        ctor, n_classes, dim, depth, heads, extra_kwargs, img_size
                    )
                except Exception:
                    continue
                diff = abs(int(target_params) - p)
                if best_diff is None or diff < best_diff:
                    best_diff, best_params = diff, p
                    best_cfg = {"dim": dim, "depth": depth, "heads": heads}
    if best_cfg is None:
        raise RuntimeError("Could not find a configuration close to target params.")
    return best_cfg, int(best_params)


def find_model_config_match_baseline(
    ctor,
    n_classes: int,
    target_params: int,
    baseline_cfg: Dict[str, int],
    baseline_params: int,
    max_ratio_diff: float = 0.01,
    dims_choices: Iterable[int] = tuple(range(64, 2049, 8)),
    depths_choices: Iterable[int] = (6, 8, 9, 10, 11, 12),
    heads_choices: Iterable[int] = (4, 6, 8),
    extra_kwargs: Optional[Dict] = None,
    img_size: int = 32,
) -> Tuple[Dict[str, int], int, bool]:
    """Structure-constrained matching (reference :249-323): candidate <=
    baseline on every axis; prefer identical structure if it fits under
    budget; otherwise score = within-1%-flag*1e12 + target_diff*1e3 +
    (10000*dHeads + 1000*dDepth + dDim)."""
    base_dim, base_depth, base_heads = (
        baseline_cfg["dim"], baseline_cfg["depth"], baseline_cfg["heads"])

    dims = [d for d in dims_choices if 0 < d <= base_dim]
    if base_dim not in dims:
        dims.append(base_dim)
    depths = [d for d in depths_choices if 0 < d <= base_depth]
    if base_depth not in depths:
        depths.append(base_depth)
    heads_list = [h for h in heads_choices if 0 < h <= base_heads]
    if base_heads not in heads_list:
        heads_list.append(base_heads)

    try:
        p_same = estimate_params(
            ctor, n_classes, base_dim, base_depth, base_heads, extra_kwargs, img_size
        )
        if p_same <= baseline_params:
            rel_gap = abs(baseline_params - p_same) / max(1, baseline_params)
            return (
                {"dim": base_dim, "depth": base_depth, "heads": base_heads},
                int(p_same),
                (rel_gap <= max_ratio_diff),
            )
    except Exception:
        pass

    best_within = best_within_params = best_within_score = None
    best_under = best_under_params = best_under_score = None
    for heads in sorted(set(heads_list)):
        for depth in sorted(set(depths)):
            cand_dims = [d for d in sorted(set(dims)) if d % heads == 0]
            if not cand_dims:
                continue
            # Param count is monotonically increasing in dim (fixed depth/heads),
            # so instead of tracing every dim, binary-search the boundary dims
            # (largest p <= baseline; p closest to target) and evaluate windows
            # around them. Selection-equivalent to the full scan: the score
            # strictly improves toward those boundaries (within-1%-of-baseline
            # flag, then |target - p|, then structure distance which also
            # prefers larger dim <= base_dim).
            def _p(d):
                try:
                    return estimate_params(
                        ctor, n_classes, d, depth, heads, extra_kwargs, img_size)
                except Exception:
                    return None

            def _boundary(limit):
                lo, hi = 0, len(cand_dims) - 1
                pos = -1
                while lo <= hi:
                    mid = (lo + hi) // 2
                    pm = _p(cand_dims[mid])
                    if pm is None:
                        # fall back to linear scan on error
                        return None
                    if pm <= limit:
                        pos = mid
                        lo = mid + 1
                    else:
                        hi = mid - 1
                return pos

            window = set()
            for limit in (baseline_params, int(target_params)):
                pos = _boundary(limit)
                if pos is None:
                    window = set(range(len(cand_dims)))  # error fallback
                    break
                window.update(range(max(0, pos - 16), min(len(cand_dims), pos + 17)))
            for di in sorted(window):
                dim = cand_dims[di]
                p = _p(dim)
                if p is None:
                    continue
                if p > baseline_params:
                    continue
                rel_gap = abs(baseline_params - p) / max(1, baseline_params)
                target_diff = abs(int(target_params) - p)
                struct_penalty = (
                    10000 * abs(base_heads - heads)
                    + 1000 * abs(base_depth - depth)
                    + abs(base_dim - dim)
                )
                score = (
                    (0 if rel_gap <= max_ratio_diff else 1) * 10**12
                    + target_diff * 10**3
                    + struct_penalty
                )
                if rel_gap <= max_ratio_diff and (
                    best_within is None or score < best_within_score
                ):
                    best_within = {"dim": dim, "depth": depth, "heads": heads}
                    best_within_params, best_within_score = p, score
                if best_under is None or score < best_under_score:
                    best_under = {"dim": dim, "depth": depth, "heads": heads}
                    best_under_params, best_under_score = p, score

    if best_within is not None:
        return best_within, int(best_within_params), True
    if best_under is not None:
        return best_under, int(best_under_params), False
    raise RuntimeError("Could not find configuration under baseline budget.")


# --------------------------- training ---------------------------


def make_lr_schedule(lr: float, steps: int, warmup_frac: float):
    """LinearLR(start 1e-3) warmup -> CosineAnnealing (reference :464-479)."""
    warmup_steps = int(max(steps, 1) * max(warmup_frac, 0.0))
    if warmup_steps > 0:
        warm = optax.linear_schedule(lr * 1e-3, lr, warmup_steps)
        cos = optax.cosine_decay_schedule(lr, max(steps - warmup_steps, 1))
        return optax.join_schedules([warm, cos], [warmup_steps])
    return optax.cosine_decay_schedule(lr, max(steps, 1))


def make_opt(lr: float, steps: int, warmup_frac: float, weight_decay: float):
    return optax.adamw(
        make_lr_schedule(lr, steps, warmup_frac), weight_decay=weight_decay
    )


# Jitted steps cached across seeds: flax module dataclasses hash by field
# values, so identical model configs share one compiled executable. Without
# this every seed builds fresh closures -> fresh jit identities -> a full
# recompile + executable load (~40-55 s each through the axon tunnel) per
# model per seed.
_STEP_CACHE: Dict = {}


def _cached_steps(model, lr, steps, warmup_frac, weight_decay, mesh, mean,
                  std, augment, grad_clip):
    try:
        # Stable mesh identity (axis names/sizes + device ids) — id(mesh)
        # can be reused by a new Mesh after GC, returning steps closed over
        # a dead mesh.
        mesh_key = (tuple(mesh.axis_names), tuple(mesh.shape.values()),
                    tuple(d.id for d in mesh.devices.flat))
        key = (model, lr, steps, warmup_frac, weight_decay, mesh_key,
               tuple(np.asarray(mean).ravel()), tuple(np.asarray(std).ravel()),
               augment, grad_clip)
        hash(key)
    except TypeError:
        # Model with unhashable fields (e.g. list-valued lens dilations):
        # build fresh, uncached.
        tx = make_opt(lr, steps, warmup_frac, weight_decay)
        return (
            tx,
            make_classifier_train_step(
                model, tx, mesh, mean, std, augment=augment,
                grad_clip=grad_clip),
            make_classifier_eval_step(model, mesh, mean, std),
        )
    if key not in _STEP_CACHE:
        tx = make_opt(lr, steps, warmup_frac, weight_decay)
        _STEP_CACHE[key] = (
            tx,
            make_classifier_train_step(
                model, tx, mesh, mean, std, augment=augment,
                grad_clip=grad_clip),
            make_classifier_eval_step(model, mesh, mean, std),
        )
    return _STEP_CACHE[key]


class ModelRun:
    """One model in a lockstep comparison: def + params + opt + steps."""

    def __init__(self, key, model, lr, mesh, mean, std, steps, warmup_frac,
                 weight_decay, seed, grad_clip=None, augment=True):
        self.key = key
        self.model = model
        rng = jax.random.PRNGKey(seed)
        x0 = jnp.zeros((2, 3, 32, 32), jnp.float32)
        # Jitted init: eager init pays per-op tunnel latency (~45 s for the
        # 5M ViT on the axon backend vs ~5 s jitted; mop_tpu/utils/init.py).
        params = jitted_init(model, {"params": rng, "dropout": rng}, x0,
                             train=True)
        self.n_params = count_parameters(params)
        tx, self.train_step, self.eval_step = _cached_steps(
            model, lr, mesh=mesh, mean=mean, std=std, steps=steps,
            warmup_frac=warmup_frac, weight_decay=weight_decay,
            augment=augment, grad_clip=grad_clip)
        self.mesh = mesh
        self.params = replicate(params, mesh)
        self.opt_state = replicate(tx.init(params), mesh)
        self.rng = rng
        self._mean_std = (mean, std)
        self.last_loss = float("nan")

    def step(self, xb, yb, step_i):
        k = jax.random.fold_in(self.rng, step_i)
        self.params, self.opt_state, m = self.train_step(
            self.params, self.opt_state, xb, yb, k
        )
        self.loss_handle = m["loss"]
        return m

    def sync_loss(self) -> float:
        self.last_loss = float(self.loss_handle)
        if not np.isfinite(self.last_loss):
            # Failure detection (SURVEY §5.3: the reference just dies with a
            # stack-dump mid-run): fail fast with actionable context instead
            # of silently training on NaNs until the final eval.
            raise FloatingPointError(
                f"non-finite loss for model '{self.key}' "
                f"({self.n_params:,} params) — typical causes: LR too high "
                f"for this variant (try --lr_mult_e style overrides), bf16 "
                f"overflow, or bad input data."
            )
        return self.last_loss

    def evaluate(self, batches) -> float:
        correct, total = 0.0, 0.0
        for xb, yb, mb in batches:
            xb, yb, mb = shard_batch(
                (np.asarray(xb), np.asarray(yb), np.asarray(mb)), self.mesh)
            c, t = self.eval_step(self.params, xb, yb, mb)
            correct += float(c)
            total += float(t)
        return correct / total if total else 0.0

    def per_sample_correct(self, batches) -> np.ndarray:
        """Per-sample correctness vector over an eval set (for McNemar)."""
        outs = []
        for xb, yb, mb in batches:
            c = self.predict_correct(xb, yb)
            outs.append(np.asarray(c)[np.asarray(mb) > 0])
        return np.concatenate(outs)

    def predict_correct(self, xb, yb):
        if not hasattr(self, "_pred_fn"):
            from mop_tpu.ops.preprocess import cifar_eval_transform

            model = self.model
            mean, std = self._mean_std

            from mop_tpu.parallel import batch_sharding, replicated

            # fp32 on purpose: McNemar per-sample stats must not pick up
            # bf16 argmax flips on borderline samples (torch ref is fp32).
            # Output replicated: the per-sample vector must be host-readable
            # on every process under a multihost launch.
            def pred(params, xb, yb):
                x = cifar_eval_transform(xb, mean, std)
                logits = model.apply(params, x, train=False)
                return jnp.argmax(logits, -1) == yb

            bsh = batch_sharding(self.mesh)
            self._pred_fn = jax.jit(
                pred,
                in_shardings=(replicated(self.mesh), bsh, bsh),
                out_shardings=replicated(self.mesh))
        xb, yb = shard_batch((np.asarray(xb), np.asarray(yb)), self.mesh)
        return self._pred_fn(self.params, xb, yb)

    def save(self, path: str, step: int) -> None:
        """Persist params + opt state + step (SURVEY §5.4: the reference has
        checkpoint helpers but no experiment ever calls them)."""
        from mop_tpu.training.utils import save_checkpoint

        save_checkpoint(path, self.params, opt_state=self.opt_state, epoch=step)

    def load(self, path: str, mesh) -> int:
        from mop_tpu.training.utils import load_checkpoint

        payload = load_checkpoint(path)
        self.params = replicate(payload["params"], mesh)
        self.opt_state = replicate(payload["opt_state"], mesh)
        return int(payload["epoch"])


def lockstep_train(
    runs: Dict[str, ModelRun],
    train_iter,
    val_batches_fn,
    steps: int,
    eval_every: int,
    mesh,
    seeds_last: bool = True,
    log=print,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 0,
    resume: bool = False,
):
    """Lockstep multi-model training on identical batches (reference :789-823).

    With ``ckpt_dir``/``ckpt_every``: periodic per-model checkpoints; with
    ``resume``: restart from the latest checkpoint step found on disk.
    When ``ckpt_dir`` is set the loop is also preemption-safe: SIGTERM
    (the TPU-VM spot/maintenance signal) checkpoints every model at the
    next step boundary and exits with code 75, so re-running the same
    command with ``--resume`` continues the run (SURVEY §5.3 — the
    reference just dies).
    Returns per-model history {key: {'steps': [...], 'acc': [...]}}.
    """
    hist = {k: {"steps": [], "acc": []} for k in runs}
    start_step = 1
    if ckpt_dir and resume:
        restored = []
        for k, run in runs.items():
            path = os.path.join(ckpt_dir, f"{k}.ckpt")
            if os.path.exists(path):
                restored.append(run.load(path, mesh))
        if restored:
            start_step = min(restored) + 1
            log(f"resumed from step {start_step - 1}")
    guard = None
    if ckpt_dir:
        from mop_tpu.training.preemption import (PREEMPTED_EXIT_CODE,
                                                 PreemptionGuard)

        guard = PreemptionGuard().install()

    def _save_all(step_i):
        os.makedirs(ckpt_dir, exist_ok=True)
        for k, run in runs.items():
            run.save(os.path.join(ckpt_dir, f"{k}.ckpt"), step_i)

    try:
        with mesh:
            for step_i in range(start_step, steps + 1):
                xb, yb = next(train_iter)
                xb, yb = shard_batch((np.asarray(xb), np.asarray(yb)), mesh)
                for run in runs.values():
                    run.step(xb, yb, step_i)
                if step_i % max(eval_every, 1) == 0 or step_i == 1:
                    loss_str = " ".join(
                        f"L{k}={r.sync_loss():.3f}" for k, r in runs.items()
                    )
                    accs = []
                    for k, r in runs.items():
                        a = r.evaluate(val_batches_fn())
                        hist[k]["steps"].append(step_i)
                        hist[k]["acc"].append(a)
                        accs.append(f"A{k}={a:.3f}")
                    log(f"step {step_i:4d} | {loss_str} | {' '.join(accs)}")
                if ckpt_dir and ckpt_every and step_i % ckpt_every == 0:
                    _save_all(step_i)
                if guard is not None and guard.preempted:
                    for r in runs.values():
                        r.sync_loss()  # host barrier: steps really landed
                    _save_all(step_i)
                    log(f"preempted at step {step_i}: checkpointed to "
                        f"{ckpt_dir}, exiting {PREEMPTED_EXIT_CODE} "
                        f"(re-run with --resume)")
                    sys.exit(PREEMPTED_EXIT_CODE)
    finally:
        if guard is not None:
            guard.uninstall()
    return hist


# --------------------------- statistics ---------------------------


def mcnemar(correct_a: np.ndarray, correct_b: np.ndarray) -> Dict[str, float]:
    """McNemar test on paired per-sample correctness (the reference's
    committed results carry mcnemar_n01/n10/chi2, see
    results/cifar10/cifar100_ab_2025-08-17/summary.json).

    n01 = A right, B wrong; n10 = A wrong, B right;
    chi2 with continuity correction.
    """
    a = np.asarray(correct_a, bool)
    b = np.asarray(correct_b, bool)
    n01 = int(np.sum(a & ~b))
    n10 = int(np.sum(~a & b))
    denom = n01 + n10
    chi2 = ((abs(n01 - n10) - 1) ** 2 / denom) if denom > 0 else 0.0
    return {"mcnemar_n01": n01, "mcnemar_n10": n10, "mcnemar_chi2": float(chi2)}


def bootstrap_delta(correct_a, correct_b, n_boot: int = 1000, seed: int = 0):
    """Mean accuracy delta (B - A) with a bootstrap 95% interval."""
    a = np.asarray(correct_a, np.float64)
    b = np.asarray(correct_b, np.float64)
    rng = np.random.RandomState(seed)
    n = len(a)
    deltas = np.empty(n_boot)
    for i in range(n_boot):
        idx = rng.randint(0, n, n)
        deltas[i] = b[idx].mean() - a[idx].mean()
    return {
        "delta_acc_mean": float(b.mean() - a.mean()),
        "delta_acc_lo": float(np.percentile(deltas, 2.5)),
        "delta_acc_hi": float(np.percentile(deltas, 97.5)),
    }


# ----------------------------- output -----------------------------


def _is_writer_process() -> bool:
    """Under a multi-process (multihost) launch every process computes the
    same replicated results; only process 0 writes artifacts."""
    import jax

    return jax.process_index() == 0


def save_csv(path: str, header: List[str], rows: List[List]) -> None:
    if not _is_writer_process():
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write(",".join(header) + "\n")
        for row in rows:
            f.write(",".join(str(v) for v in row) + "\n")


def save_val_curve_plot(path, hist, title):
    if not _is_writer_process():
        return
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(8, 5))
    for key, h in hist.items():
        if h["steps"]:
            plt.plot(h["steps"], h["acc"], label=key)
    plt.xlabel("Step")
    plt.ylabel("Val Accuracy")
    plt.title(title)
    plt.legend()
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    plt.savefig(path)
    plt.close()


def save_test_bar_plot(path, labels, vals, title):
    if not _is_writer_process():
        return
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(6, 4))
    plt.bar(labels, vals)
    plt.ylim(0, 1)
    plt.ylabel("Test Accuracy")
    plt.title(title)
    plt.tight_layout()
    plt.savefig(path)
    plt.close()
