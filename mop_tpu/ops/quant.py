"""Weight-only int8 quantization for the serving/decode path.

The reference has no inference story at all (its models stop at
teacher-forced logits, ``mop/models/gpt_mop.py:181-207``); this module is
part of the TPU-native serving layer around ``mop_tpu.models.generate``.

Scheme: per-output-channel symmetric int8 ("weight-only" quantization).
Matmul weights are stored as int8 with one fp32 scale per output feature;
activations stay in the compute dtype and the weight is upcast in-register
at use (XLA fuses the convert into the dot's operand read). On TPU the
single-token decode step is HBM-bandwidth-bound on *weight* traffic, so
int8 weights cut the dominant term 4x vs fp32 (2x vs bf16) with no change
to the MXU path. Accuracy is bounded by the per-channel grid: 127 levels
over max|w|, i.e. <=0.4% relative weight error, measured end-to-end in
tests/test_quant.py and benchmarks/decode.md.

Usage::

    qparams = quantize_params(params)          # kernels -> QTensor
    out = generate_cached(model, qparams, prompt, ...)   # same API

``QTensor`` is a pytree (flax struct), so quantized params thread through
jit/scan/shard unchanged; ``_lin``-style appliers dispatch on isinstance.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

Array = jax.Array


@flax.struct.dataclass
class QTensor:
    """Symmetric per-output-channel int8 weight: ``w ~= q * scale``.

    ``q``: int8, same shape as the original weight.
    ``scale``: fp32, shape broadcastable over ``q`` (one per out-channel).
    """

    q: Array
    scale: Array

    def dequant(self, dtype=jnp.float32) -> Array:
        return (self.q.astype(jnp.float32) * self.scale).astype(dtype)


def quantize(w: Array, channel_axis: int = -1) -> QTensor:
    """Quantize a weight to int8 with one scale per ``channel_axis`` slice.

    For a (in, out) matmul kernel the default ``channel_axis=-1`` gives one
    scale per output feature — the standard weight-only layout (each output
    column's grid is set by its own max|w|, so a few large weights in one
    column don't crush the resolution of the rest).
    """
    w32 = w.astype(jnp.float32)
    reduce_axes = tuple(a for a in range(w.ndim)
                        if a != (channel_axis % w.ndim))
    amax = jnp.max(jnp.abs(w32), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return QTensor(q=q, scale=scale)


def qmatmul(x: Array, qt: QTensor) -> Array:
    """``x @ w`` with an int8 weight: upcast-in-register, fp32 accumulate.

    The int8->compute-dtype convert fuses into the dot's operand read, so
    HBM sees 1 byte/weight. Accumulation follows the TPU default (fp32 for
    bf16 operands).
    """
    y = x @ qt.q.astype(x.dtype)
    return y * qt.scale.reshape(qt.scale.shape[-1]).astype(y.dtype)


def _is_quantizable(path: tuple, leaf: Any, min_size: int) -> bool:
    if not isinstance(leaf, (jnp.ndarray, jax.Array)):
        return False
    key = getattr(path[-1], "key", None) if path else None
    return (key == "kernel" and leaf.ndim == 2 and leaf.size >= min_size)


def quantize_params(params: Any, min_size: int = 4096, bits: int = 8,
                    group: int = 64) -> Any:
    """Replace every 2-D ``kernel`` leaf (>= ``min_size`` elements) with a
    ``QTensor`` (``bits=8``, per-output-channel) or ``Q4Tensor`` (``bits=4``,
    group-wise nibble-packed). Everything else — biases, LayerNorm scales,
    embeddings, conv kernels, the quartet mixture scalars — stays in full
    precision (they are a small fraction of weight bytes and
    disproportionately accuracy-sensitive).

    Returns a tree with the same structure; appliers that route matmuls
    through an isinstance-dispatching ``_lin`` (``mop_tpu.models.generate``)
    accept it directly.
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    def quant_one(leaf):
        if bits == 4 and leaf.shape[0] % 2 == 0:
            return quantize4(leaf, group=group)
        return quantize(leaf)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = [quant_one(leaf) if _is_quantizable(path, leaf, min_size)
              else leaf
              for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _is_q(leaf: Any) -> bool:
    return isinstance(leaf, (QTensor, Q4Tensor))


def dequantize_params(params: Any, dtype=jnp.float32) -> Any:
    """Inverse of :func:`quantize_params` (up to grid rounding)."""
    return jax.tree_util.tree_map(
        lambda l: l.dequant(dtype) if _is_q(l) else l,
        params, is_leaf=_is_q)


def quantized_bytes(params: Any) -> tuple[int, int]:
    """(bytes as stored with Q/Q4Tensors, bytes if everything were fp32)."""
    stored = 0
    fp32 = 0
    for leaf in jax.tree_util.tree_leaves(params, is_leaf=_is_q):
        if isinstance(leaf, QTensor):
            stored += leaf.q.size + leaf.scale.size * 4
            fp32 += leaf.q.size * 4
        elif isinstance(leaf, Q4Tensor):
            stored += leaf.q.size + leaf.scale.size * 4
            fp32 += leaf.q.size * 2 * 4
        else:
            stored += leaf.size * leaf.dtype.itemsize
            fp32 += leaf.size * 4
    return stored, fp32


# --------------------------- int4 (group-wise) ---------------------------
#
# 4-bit weight-only quantization halves stored weight bytes again vs int8
# (0.5 B/weight + fp32 group scales). 15 levels is too coarse for one scale
# per output column, so scales are GROUP-WISE along the input axis (default
# 64 rows/group: scale overhead 4/64 B/weight = 1/8 of the nibble itself).
# Nibbles are packed two-per-int8 because int4 jax arrays cannot cross the
# host<->device boundary on the axon platform (device_put recursion) —
# packed int8 storage sidesteps that and is what HBM sees either way; the
# unpack (two arithmetic shifts) fuses into the dequant chain under jit.


@flax.struct.dataclass
class Q4Tensor:
    """Group-wise symmetric int4 weight, nibble-packed: ``w ~= q * scale``.

    ``q``: int8 of shape (in/2, out) — row 2i in the low nibble, row 2i+1
    in the high nibble, both sign-extended on unpack.
    ``scale``: fp32 (n_groups, out), one per ``group`` input rows/column.
    """

    q: Array
    scale: Array
    group: int = flax.struct.field(pytree_node=False, default=64)

    def unpack(self) -> Array:
        """(in, out) int8 in [-8, 7]: interleaved sign-extended nibbles."""
        lo = jnp.right_shift(jnp.left_shift(self.q, 4), 4)
        hi = jnp.right_shift(self.q, 4)
        return jnp.stack([lo, hi], axis=1).reshape(-1, self.q.shape[-1])

    def dequant(self, dtype=jnp.float32) -> Array:
        qi = self.unpack()
        n_in, n_out = qi.shape
        w = qi.astype(jnp.float32).reshape(-1, self.group, n_out)
        return (w * self.scale[:, None, :]).reshape(n_in, n_out).astype(dtype)


def quantize4(w: Array, group: int = 64, clip_search: int = 16) -> Q4Tensor:
    """Quantize a 2-D (in, out) kernel to group-wise int4.

    ``group`` input rows share one fp32 scale per output column; if the
    input dim is not divisible, the whole column is one group. Levels are
    clipped to [-7, 7] (symmetric grid; -8 unused so the grid is unbiased).

    With 15 levels the max-abs scale is rarely MSE-optimal: one outlier
    weight stretches the grid and coarsens the other ``group - 1`` rows.
    ``clip_search`` > 0 searches that many clip ratios in [0.65, 1.0] per
    group and keeps the scale with the lowest round-trip MSE (AWQ-style
    grid search; pure offline cost, the stored format is unchanged).
    """
    n_in, n_out = w.shape
    if n_in % 2:
        raise ValueError(f"int4 packing needs an even input dim, got {n_in}")
    if n_in % group:
        group = n_in
    if group % 2:
        raise ValueError(f"group must be even (nibble pairs share a "
                         f"packed row), got {group}")
    w32 = w.astype(jnp.float32).reshape(n_in // group, group, n_out)
    amax = jnp.max(jnp.abs(w32), axis=1)  # (n_groups, out)
    scale = jnp.maximum(amax, 1e-12) / 7.0
    if clip_search:
        ratios = jnp.linspace(0.65, 1.0, clip_search)

        def mse_for(r):
            s = scale * r
            q = jnp.clip(jnp.round(w32 / s[:, None, :]), -7, 7)
            return s, jnp.sum((q * s[:, None, :] - w32) ** 2, axis=1)

        cand_s, cand_mse = jax.lax.map(mse_for, ratios)  # (C, G, out)
        best = jnp.argmin(cand_mse, axis=0)              # (G, out)
        scale = jnp.take_along_axis(cand_s, best[None], axis=0)[0]
    q = jnp.clip(jnp.round(w32 / scale[:, None, :]), -7, 7)
    q = q.astype(jnp.int8).reshape(n_in, n_out)
    lo = q[0::2]
    hi = q[1::2]
    packed = jnp.bitwise_or(jnp.left_shift(hi, 4),
                            jnp.bitwise_and(lo, 0x0F)).astype(jnp.int8)
    return Q4Tensor(q=packed, scale=scale, group=group)


def q4matmul(x: Array, qt: Q4Tensor) -> Array:
    """``x @ w`` with a packed int4 weight, de-interleaved.

    ``x @ w == x[..., 0::2] @ w_lo + x[..., 1::2] @ w_hi`` where ``w_lo`` /
    ``w_hi`` are the sign-extended nibbles scaled by their group's fp32
    scale. Crucially this never rebuilds the interleaved (in, out) weight:
    the naive ``x @ dequant()`` needs a stack+reshape interleave that XLA
    must materialize (measured 3.6x SLOWER than the fp32 matmul at 170M
    scale), while each nibble here is a pure elementwise chain
    (shift -> convert -> scale) that fuses into its dot's operand read.

    Packed row ``i`` holds original rows ``2i`` (lo) and ``2i+1`` (hi), so
    both nibbles of row ``i`` share group ``i // (group//2)`` — the scale
    broadcast is a reshape, not a gather.
    """
    q, scale, group = qt.q, qt.scale, qt.group
    n_half, n_out = q.shape
    g2 = group // 2
    dt = x.dtype

    def w_from(nib):  # (n_half, n_out) int8 nibble -> scaled compute dtype
        w = nib.astype(jnp.float32).reshape(-1, g2, n_out)
        return (w * scale[:, None, :]).reshape(n_half, n_out).astype(dt)

    lo = jnp.right_shift(jnp.left_shift(q, 4), 4)
    hi = jnp.right_shift(q, 4)
    return x[..., 0::2] @ w_from(lo) + x[..., 1::2] @ w_from(hi)
