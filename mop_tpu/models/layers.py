"""Thin flax.linen layer wrappers with PyTorch-compatible defaults.

The reference framework (Eran-BA/MoP) relies on torch's default initializers
(kaiming-uniform for weights, fan-in uniform for biases) and on exact
trainable-parameter counts (its parameter-budget matcher and the
``tests/test_param_parity.py`` contract assume specific layer shapes — see
reference ``mop/models/components.py:43-82``). These wrappers reproduce both:
identical parameter shapes/counts and identical init *distributions*, while
keeping TPU-idiomatic NHWC conv layouts internally.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def torch_kaiming_uniform(scale: float = 1.0 / 3.0):
    """torch's kaiming_uniform_(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    return nn.initializers.variance_scaling(scale, "fan_in", "uniform")


def fan_in_bias_init(fan_in: int):
    """torch Linear/Conv bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_init(std: float = 0.02):
    return nn.initializers.normal(stddev=std)


class Linear(nn.Module):
    """Dense layer with torch-default init and torch param naming.

    Mirrors ``torch.nn.Linear(in, out, bias=...)`` (reference
    ``components.py:51-53``): weight ~ kaiming-uniform, bias ~ fan-in uniform.
    """

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        kinit = self.kernel_init or torch_kaiming_uniform()
        kernel = self.param("kernel", kinit, (in_features, self.features))
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", fan_in_bias_init(in_features), (self.features,))
            y = y + bias
        return y


class Conv(nn.Module):
    """2D convolution over NHWC with torch-default init.

    Equivalent to ``torch.nn.Conv2d`` (stride/padding/dilation/groups), but the
    data layout is NHWC and the kernel is HWIO — the TPU-native layout.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: object = 0  # int, tuple, or 'SAME'/'VALID'
    dilation: Tuple[int, int] = (1, 1)
    feature_group_count: int = 1
    use_bias: bool = True
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        fan_in = (in_ch // self.feature_group_count) * kh * kw
        kinit = self.kernel_init or torch_kaiming_uniform()
        kernel = self.param(
            "kernel",
            kinit,
            (kh, kw, in_ch // self.feature_group_count, self.features),
        )
        if isinstance(self.padding, int):
            pad = [(self.padding, self.padding), (self.padding, self.padding)]
        elif isinstance(self.padding, (tuple, list)) and len(self.padding) == 2 and all(
            isinstance(p, int) for p in self.padding
        ):
            pad = [(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])]
        else:
            pad = self.padding
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=self.strides,
            padding=pad,
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            bias = self.param("bias", fan_in_bias_init(fan_in), (self.features,))
            y = y + bias
        return y


class Conv1d(nn.Module):
    """1D convolution over NLC (batch, length, channels) with torch defaults.

    Equivalent to ``torch.nn.Conv1d`` (reference ``gpt_mop.py:35-47``,
    ``attention_variants.py:393-423``), re-laid-out channels-last for TPU.
    """

    features: int
    kernel_size: int
    padding: object = 0
    dilation: int = 1
    feature_group_count: int = 1
    use_bias: bool = True
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.feature_group_count) * self.kernel_size
        kinit = self.kernel_init or torch_kaiming_uniform()
        kernel = self.param(
            "kernel",
            kinit,
            (self.kernel_size, in_ch // self.feature_group_count, self.features),
        )
        if isinstance(self.padding, int):
            pad = [(self.padding, self.padding)]
        elif isinstance(self.padding, (tuple, list)) and len(self.padding) == 2:
            pad = [tuple(self.padding)]
        else:
            pad = self.padding
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=pad,
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NLC", "LIO", "NLC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            bias = self.param("bias", fan_in_bias_init(fan_in), (self.features,))
            y = y + bias
        return y


class LayerNorm(nn.Module):
    """LayerNorm with torch defaults (eps=1e-5, affine weight+bias)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class Embedding(nn.Module):
    """Embedding table, normal(0.02) init by default (reference gpt_mop.py:178)."""

    num_embeddings: int
    features: int
    embedding_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, idx: Array) -> Array:
        einit = self.embedding_init or normal_init(0.02)
        table = self.param("embedding", einit, (self.num_embeddings, self.features))
        return jnp.take(table, idx, axis=0)

    def attend(self, x: Array) -> Array:
        """Tied-head projection: x @ table.T (reference gpt_mop.py:169)."""
        table = self.get_variable("params", "embedding")
        return x @ table.T


def gelu_tanh(x: Array) -> Array:
    """GELU with tanh approximation, matching torch GELU(approximate='tanh')."""
    return jax.nn.gelu(x, approximate=True)


def dropout(x: Array, rate: float, deterministic: bool, rng) -> Array:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
