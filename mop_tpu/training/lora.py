"""LoRA: low-rank adapter fine-tuning for any model in the framework.

Beyond-reference capability (the reference has no fine-tuning support of
any kind — every experiment trains from scratch, SURVEY §0/§2.2). The
TPU-native formulation trains THROUGH an explicit merge: the jitted step
computes ``W + (alpha/r) * A @ B`` for each adapted kernel and runs the
unchanged model on the merged tree, so

- gradients flow only to the rank-r factors (the base tree is a closed-over
  constant — never donated, never updated, never copied per step beyond the
  rank-r outer products XLA fuses into the surrounding graph);
- every existing model/apply/serving path works unmodified on the merged
  tree (``lora_merge`` materializes it once for deployment);
- optimizer state is O(adapter params): AdamW moments for a 5M-param model
  at rank 8 are a few hundred KB instead of 40 MB.

Adapters are a flat ``{path: {"a": (din, r), "b": (r, dout)}}`` dict — an
ordinary pytree, so ``jax.grad``/optax/checkpointing work on it directly.
``b`` starts at zero: step 0 is exactly the base model.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax import tree_util as jtu

Array = jax.Array


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jtu.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jtu.SequenceKey):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def default_match(path: str, leaf) -> bool:
    """Adapt every 2-D ``kernel`` leaf (all Dense/linear weights; embedding
    tables and biases/scales are never matched)."""
    return path.endswith("kernel") and getattr(leaf, "ndim", 0) == 2


def lora_init(rng: Array, params, rank: int,
              match: Optional[Callable[[str, Array], bool]] = None,
              a_std: float = 0.02) -> dict:
    """Build zero-effect adapters for every matched kernel in ``params``.

    ``match(path, leaf)``: predicate over the slash-joined param path (e.g.
    ``params/blocks_0/attn/q_proj/kernel``) and the leaf array; default
    adapts every 2-D kernel. ``a`` ~ N(0, a_std²) (the repo's standard init
    scale), ``b`` = 0, so ``lora_merge(params, adapters) == params`` until
    the first update."""
    if rank < 1:
        raise ValueError(f"rank must be >= 1, got {rank}")
    match = default_match if match is None else match
    flat, _ = jtu.tree_flatten_with_path(params)
    adapters = {}
    for path, leaf in flat:
        ps = _path_str(path)
        if not match(ps, leaf):
            continue
        din, dout = leaf.shape
        rng, sub = jax.random.split(rng)
        adapters[ps] = {
            "a": (jax.random.normal(sub, (din, rank), jnp.float32)
                  * a_std).astype(leaf.dtype),
            "b": jnp.zeros((rank, dout), leaf.dtype),
        }
    if not adapters:
        raise ValueError("lora_init matched no kernels")
    return adapters


def lora_merge(params, adapters: dict, scale: float = 1.0):
    """Return a params tree with ``W + scale * a @ b`` at every adapted
    path (other leaves are the original arrays, not copies). ``scale`` is
    the LoRA ``alpha / rank``; 1.0 by default (alpha = rank)."""
    def fix(path, leaf):
        ad = adapters.get(_path_str(path))
        if ad is None:
            return leaf
        return leaf + scale * (ad["a"] @ ad["b"]).astype(leaf.dtype)

    return jtu.tree_map_with_path(fix, params)


def lora_param_count(adapters: dict) -> int:
    return sum(int(x.size) for ad in adapters.values()
               for x in ad.values())


def make_lora_train_step(loss_of_params: Callable, base_params,
                         optimizer, scale: float = 1.0):
    """Generic adapter-only train step.

    ``loss_of_params(merged_params, *batch) -> scalar`` is the task loss on
    the FULL (merged) tree — e.g. a closure over ``model.apply``. Returns a
    jitted ``step(adapters, opt_state, *batch) -> (adapters, opt_state,
    loss)`` that differentiates only the adapters; ``base_params`` is
    closed over and never updated."""

    @jax.jit
    def step(adapters, opt_state, *batch):
        def loss_fn(ad):
            return loss_of_params(lora_merge(base_params, ad, scale),
                                  *batch)

        loss, grads = jax.value_and_grad(loss_fn)(adapters)
        updates, opt_state = optimizer.update(grads, opt_state, adapters)
        return optax.apply_updates(adapters, updates), opt_state, loss

    return step


def make_lora_lm_train_step(model, base_params, optimizer,
                            scale: float = 1.0):
    """LM convenience: ``step(adapters, opt_state, idx, targets)`` for any
    GPT-family model whose ``apply(params, idx, targets=...)`` returns
    ``(logits, loss)``."""

    def loss_of_params(p, idx, targets):
        _, loss = model.apply(p, idx, targets=targets, train=False)
        return loss

    return make_lora_train_step(loss_of_params, base_params, optimizer,
                                scale)
