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


def quantize_params(params: Any, min_size: int = 4096) -> Any:
    """Replace every 2-D ``kernel`` leaf (>= ``min_size`` elements) with a
    ``QTensor``. Everything else — biases, LayerNorm scales, embeddings,
    conv kernels, the quartet mixture scalars — stays in full precision
    (they are a small fraction of weight bytes and disproportionately
    accuracy-sensitive).

    Returns a tree with the same structure; appliers that route matmuls
    through an isinstance-dispatching ``_lin`` (``mop_tpu.models.generate``)
    accept it directly.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = [quantize(leaf) if _is_quantizable(path, leaf, min_size)
              else leaf
              for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def dequantize_params(params: Any, dtype=jnp.float32) -> Any:
    """Inverse of :func:`quantize_params` (up to grid rounding)."""
    return jax.tree_util.tree_map(
        lambda l: l.dequant(dtype) if isinstance(l, QTensor) else l,
        params, is_leaf=lambda l: isinstance(l, QTensor))


def quantized_bytes(params: Any) -> tuple[int, int]:
    """(bytes as stored with QTensors, bytes if everything were fp32)."""
    stored = 0
    fp32 = 0
    for leaf in jax.tree_util.tree_leaves(
            params, is_leaf=lambda l: isinstance(l, QTensor)):
        if isinstance(leaf, QTensor):
            stored += leaf.q.size + leaf.scale.size * 4
            fp32 += leaf.q.size * 4
        else:
            stored += leaf.size * leaf.dtype.itemsize
            fp32 += leaf.size * 4
    return stored, fp32
