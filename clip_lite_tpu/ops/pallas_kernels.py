"""Pallas TPU kernels for the input pipeline's hot elementwise ops.

``normalize_u8``: fused uint8 -> float per-channel affine normalization.
One pass HBM->VMEM->HBM; the uint8 source halves the read bandwidth vs a
pre-converted fp32 tensor and the write is bf16 under AMP.  The (B,H,W,3)
image is viewed as (B*H, W*3) so the lane dimension is a multiple of 3;
the channel of each lane is recovered with an iota-mod-3 select (TPU VPU
friendly; avoids a gather).

The kernel grid walks row-blocks of the flattened view; each block is
(BLOCK_ROWS, W*3) in VMEM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_lite_tpu.data.transforms import (
    IMAGENET_COLOR_MEAN,
    IMAGENET_COLOR_STD,
)


def _normalize_kernel(x_ref, out_ref, *, m0, m1, m2, s0, s1, s2):
    x = x_ref[:].astype(jnp.float32)
    rows, lanes = x.shape
    ch = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1) % 3
    mean = jnp.where(ch == 0, m0, jnp.where(ch == 1, m1, m2))
    inv_std = jnp.where(ch == 0, s0, jnp.where(ch == 1, s1, s2))
    out_ref[:] = ((x - mean) * inv_std).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dtype", "block_rows",
                                             "interpret"))
def normalize_u8(images: jax.Array, dtype=jnp.float32,
                 block_rows: int = 256, interpret: bool = False) -> jax.Array:
    """(B, H, W, 3) uint8/float -> ImageNet-normalized ``dtype``."""
    b, h, w, c = images.shape
    assert c == 3, "expects RGB"
    flat = images.reshape(b * h, w * c)
    n_rows = flat.shape[0]
    block_rows = min(block_rows, n_rows)
    grid = (pl.cdiv(n_rows, block_rows),)

    mean = [m * 255.0 for m in IMAGENET_COLOR_MEAN]
    inv_std = [1.0 / (s * 255.0) for s in IMAGENET_COLOR_STD]
    kernel = functools.partial(
        _normalize_kernel, m0=mean[0], m1=mean[1], m2=mean[2],
        s0=inv_std[0], s1=inv_std[1], s2=inv_std[2])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, w * c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, w * c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat)
    return out.reshape(b, h, w, c)
