"""Ring attention: context parallelism over a mesh axis.

Sequences longer than one chip's HBM are sharded over a mesh axis; each
device holds a (B, H, N/S, dk) slice of Q/K/V. K/V blocks rotate around the
ring via ``ppermute`` while every device folds the visiting block into a
running flash-style (max, denominator, output) accumulator — full N x N
scores never exist anywhere, and the communication is S-1 neighbor hops over
ICI instead of any gather.

This is the cross-device complement of the single-chip blockwise flash
kernel (``ops/fused.py``): flash tiles the sequence inside VMEM; the ring
tiles it across chips. The reference materializes all N x N maps on one
device (SURVEY §5.7) — long context is a TPU-native addition.

The whole schedule is differentiable (ppermute has a transpose rule), so the
same function trains; grads are checked against full attention in
tests/test_ring_attention.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def _ring_body(q, k, v, scale, axis_name: str, causal: bool):
    """Per-shard ring loop. q/k/v: (B, H, Nl, dk) local blocks."""
    s_size = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, h, nl, dk = q.shape
    perm = [(i, (i + 1) % s_size) for i in range(s_size)]

    q_pos = my * nl + jnp.arange(nl)  # global positions of my queries

    def fold(carry, step):
        o, m, l, k_cur, v_cur = carry
        # The block visiting at `step` started at shard (my - step) mod S.
        kv_block = (my - step) % s_size
        kv_pos = kv_block * nl + jnp.arange(nl)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cur,
                       preferred_element_type=jnp.float32) * scale
        if causal:
            mask = q_pos[:, None] >= kv_pos[None, :]
            s = jnp.where(mask[None, None], s, -jnp.inf)
        blk_max = jnp.max(s, axis=-1)
        new_m = jnp.maximum(m, blk_max)
        # exp(-inf - -inf) guards: fully-masked rows keep m = -inf; correct
        # the scale factor to 0 there instead of NaN.
        alpha = jnp.where(jnp.isneginf(m) & jnp.isneginf(new_m),
                          0.0, jnp.exp(m - new_m))
        p = jnp.exp(s - new_m[..., None])
        p = jnp.where(jnp.isneginf(new_m)[..., None], 0.0, p)
        l = l * alpha + jnp.sum(p, axis=-1)
        o = o * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_cur.dtype), v_cur,
            preferred_element_type=jnp.float32)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (o, new_m, l, k_nxt, v_nxt), None

    o0 = jnp.zeros((b, h, nl, dk), jnp.float32)
    m0 = jnp.full((b, h, nl), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, nl), jnp.float32)
    (o, m, l, _, _), _ = jax.lax.scan(
        fold, (o0, m0, l0, k, v), jnp.arange(s_size))
    l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows -> zero output
    return (o / l[..., None]).astype(q.dtype)


def ring_attention(
    q: Array,
    k: Array,
    v: Array,
    mesh: Mesh,
    axis: str = "model",
    causal: bool = False,
    scale: Optional[float] = None,
    manual_only: bool = False,
) -> Array:
    """Context-parallel attention. q/k/v: GLOBAL (B, H, N, dk) arrays whose
    sequence axis is (or will be) sharded over ``mesh[axis]``; N must divide
    by the axis size. Returns (B, H, N, dk) sharded the same way.

    ``manual_only=True`` makes the shard_map manual over ONLY ``axis``
    (jax.shard_map axis_names), leaving the remaining mesh axes to GSPMD —
    this is how the ring composes inside a tensor-parallel block: heads stay
    sharded over 'model' by the TP param shardings while the sequence ring
    runs over a separate axis (tests/test_parallel_composed.py)."""
    b, h, n, dk = q.shape
    s_size = mesh.shape[axis]
    if n % s_size != 0:
        raise ValueError(
            f"ring_attention: sequence length {n} must divide by the "
            f"'{axis}' mesh axis size {s_size}")
    sc = (1.0 / jnp.sqrt(dk)) if scale is None else scale
    body = partial(_ring_body, scale=sc, axis_name=axis, causal=causal)
    spec = P(None, None, axis, None)
    kw = dict(axis_names=frozenset({axis})) if manual_only else {}
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
        **kw,
    )(q, k, v)
