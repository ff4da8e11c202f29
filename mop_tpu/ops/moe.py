"""Top-1 MoE dispatch — routed block matmul instead of compute-all-experts.

The reference's MoEMLP computes every expert for every token and masks with a
one-hot (``mop/models/components.py:113-121`` — "not attempting compute
savings"). This module provides the TPU-native routed equivalent: tokens are
dispatched into per-expert capacity buffers (static shapes), experts run as
one batched (E, C, D) x (E, D, H) matmul on the MXU, and outputs are combined
back. Compute drops from O(T*E*D*H) to O(E*C*D*H) with C ~= T/E * factor.

Capacity semantics: with ``capacity_factor`` large enough to hold the worst
expert load the result is exactly the reference's; overflowing tokens (beyond
capacity) produce zero output, the standard MoE convention.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def top1_dispatch(expert: Array, num_experts: int, capacity: int):
    """Compute dispatch indices for top-1 routing.

    expert: (T,) int — chosen expert per token.
    Returns (slot (T,) int in [0, E*C] where E*C means 'dropped', keep (T,) bool).
    """
    onehot = jax.nn.one_hot(expert, num_experts, dtype=jnp.int32)  # (T, E)
    pos = jnp.cumsum(onehot, axis=0) - 1  # (T, E) position within expert
    pos_tok = jnp.sum(pos * onehot, axis=-1)  # (T,)
    keep = pos_tok < capacity
    slot = expert * capacity + jnp.minimum(pos_tok, capacity - 1)
    slot = jnp.where(keep, slot, num_experts * capacity)  # overflow bucket
    return slot, keep


def top1_routed_mlp(
    x: Array,
    gate_w: Array,
    gate_b: Array,
    w1: Array,
    w2: Array,
    act: Callable[[Array], Array],
    capacity_factor: float = 1.25,
) -> Array:
    """Token-level top-1 MoE MLP with routed dispatch.

    x: (T, D); gate_w: (D, E); w1: (E, D, H); w2: (E, H, D).
    """
    t, d = x.shape
    e = w1.shape[0]
    c = int(math.ceil(t / e * capacity_factor))
    c = max(1, min(c, t))

    logits = x @ gate_w + gate_b
    expert = jnp.argmax(logits, axis=-1)
    slot, keep = top1_dispatch(expert, e, c)

    # Scatter tokens into (E*C + 1, D); the final row is the overflow bucket.
    buf = jnp.zeros((e * c + 1, d), x.dtype).at[slot].set(x)
    buf = buf[: e * c].reshape(e, c, d)
    h = act(jnp.einsum("ecd,edh->ech", buf, w1,
                       preferred_element_type=jnp.float32).astype(x.dtype))
    y = jnp.einsum("ech,ehd->ecd", h, w2,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    out = y.reshape(e * c, d)
    # Combine: gather each token's slot; dropped tokens get zeros.
    gathered = jnp.concatenate([out, jnp.zeros((1, d), x.dtype)])[slot]
    return gathered * keep[:, None].astype(x.dtype)


def expert_parallel_top1_mlp(
    x: Array,
    gate_w: Array,
    gate_b: Array,
    w1: Array,
    w2: Array,
    act: Callable[[Array], Array],
    mesh,
    capacity_factor: float = 1.25,
    model_axis: str = "model",
) -> Array:
    """Expert-parallel top-1 MoE over the mesh's ``model`` axis.

    Experts are PARTITIONED across the model axis (each shard holds E/M
    experts' weights — the weights never replicate), tokens are sharded over
    the same axis, and dispatch/combine ride two ``all_to_all`` collectives
    over ICI. The reference has no distributed MoE at all (single-device
    compute-all-experts, ``mop/models/components.py:113-121``); this is the
    scale-out path BASELINE.json's multi-chip target implies.

    x: (T, D) with T divisible by M; w1: (E, D, H), w2: (E, H, D) with E
    divisible by M; gate_w/gate_b replicated. Returns (T, D) sharded like x.
    Tokens beyond per-source-shard expert capacity produce zeros (standard
    MoE overflow); with ``capacity_factor`` large enough the result equals
    ``dense_top1_mlp`` exactly.
    """
    from jax.sharding import PartitionSpec as P

    m = mesh.shape[model_axis]
    t, d = x.shape
    e = w1.shape[0]
    assert e % m == 0 and t % m == 0, (e, t, m)
    t_loc = t // m
    # Per-SOURCE-shard capacity: each source may send at most c_src tokens to
    # any one expert, so the gathered buffer is (E_loc, M * c_src) per shard.
    c_src = max(1, min(int(math.ceil(t_loc / e * capacity_factor)), t_loc))

    def local(x_loc, gate_w, gate_b, w1_loc, w2_loc):
        logits = x_loc @ gate_w + gate_b
        expert = jnp.argmax(logits, axis=-1)
        slot, keep = top1_dispatch(expert, e, c_src)
        # Per-destination-expert buffers for MY tokens: (E * c_src, D).
        buf = jnp.zeros((e * c_src + 1, d), x_loc.dtype).at[slot].set(x_loc)
        buf = buf[: e * c_src].reshape(e, c_src, d)
        # Dispatch: every shard keeps its own expert block, receives the
        # matching block from all peers (source-major concat).
        buf = jax.lax.all_to_all(buf, model_axis, split_axis=0,
                                 concat_axis=1, tiled=True)
        # buf: (E_loc, M * c_src, D) — run MY experts on the MXU.
        h = act(jnp.einsum("ecd,edh->ech", buf, w1_loc,
                           preferred_element_type=jnp.float32).astype(x_loc.dtype))
        y = jnp.einsum("ech,ehd->ecd", h, w2_loc,
                       preferred_element_type=jnp.float32).astype(x_loc.dtype)
        # Combine: route results back to their source shards.
        y = jax.lax.all_to_all(y, model_axis, split_axis=1,
                               concat_axis=0, tiled=True)
        out = y.reshape(e * c_src, d)
        gathered = jnp.concatenate([out, jnp.zeros((1, d), x_loc.dtype)])[slot]
        return gathered * keep[:, None].astype(x_loc.dtype)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(model_axis), P(), P(), P(model_axis), P(model_axis)),
        out_specs=P(model_axis),
    )(x, gate_w, gate_b, w1, w2)


def dense_top1_mlp(x, gate_w, gate_b, w1, w2, act) -> Array:
    """Reference-exact path: compute all experts, mix by one-hot
    (``components.py:113-121``)."""
    logits = x @ gate_w + gate_b
    one_hot = jax.nn.one_hot(jnp.argmax(logits, -1), w1.shape[0], dtype=x.dtype)
    h = act(jnp.einsum("td,edh->teh", x, w1))
    y = jnp.einsum("teh,ehd->ted", h, w2)
    return jnp.einsum("ted,te->td", y, one_hot)
