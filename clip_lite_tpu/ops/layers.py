"""Shared NN layers with PyTorch-default initialization semantics.

The reference relies on torch defaults everywhere (kaiming-uniform with
a=sqrt(5) for Linear weights, i.e. U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for
both weight and bias).  Matching the *distribution* of initial weights is a
prerequisite for loss-curve parity when training from scratch
(SURVEY.md "hard parts" #1).

All layers follow the mixed-precision policy: parameters live in float32,
compute runs in ``dtype`` (bfloat16 on TPU under AMP), and normalization
statistics are always computed in float32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default.

    ``shape`` is (fan_in, fan_out) in JAX convention.
    """
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Linear(nn.Module):
    """Dense layer with torch-default init and explicit dtype policy."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        bound = 1.0 / math.sqrt(in_features) if in_features > 0 else 0.0

        kinit = self.kernel_init or torch_linear_kernel_init
        kernel = self.param("kernel", kinit, (in_features, self.features), jnp.float32)

        x = x.astype(self.dtype)
        y = jnp.dot(x, kernel.astype(self.dtype),
                    preferred_element_type=self.dtype)
        if self.use_bias:
            binit = self.bias_init or (
                lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                    key, shape, dtype, -bound, bound
                )
            )
            bias = self.param("bias", binit, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class BatchNorm(nn.Module):
    """BatchNorm with torch semantics (momentum 0.1, eps 1e-5), fp32 stats.

    Running statistics live in the ``batch_stats`` collection.  When
    ``axis_name`` is set (sync-BN mode) batch statistics are averaged
    across that mesh axis — the cross-replica upgrade the reference's DDP
    never does (SURVEY.md hard part #4).
    """

    use_running_average: bool = False
    momentum: float = 0.9  # flax decay == 1 - torch momentum(0.1)
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        out = nn.BatchNorm(
            use_running_average=ura,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            axis_name=self.axis_name,
        )(x.astype(jnp.float32))
        return out.astype(self.dtype)


class LayerNorm(nn.Module):
    """LayerNorm with torch defaults (eps 1e-5), computed in fp32."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = nn.LayerNorm(
            epsilon=self.epsilon, dtype=jnp.float32, param_dtype=jnp.float32
        )(x.astype(jnp.float32))
        return out.astype(self.dtype)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch F.normalize(p=2) semantics: x / max(||x||, eps), in fp32."""
    x = x.astype(jnp.float32)
    norm = jnp.linalg.norm(x, ord=2, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
