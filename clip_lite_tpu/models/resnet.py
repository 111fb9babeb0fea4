"""ResNet image towers in Flax, with torchvision-v1 semantics.

The reference instantiates any torchvision classification model by name and
chops the classifier (reference: encoder.py:36-41).  These are from-scratch
Flax modules with the same architecture contract so that (a) feature sizes
match config expectations (512 for resnet18/34, 2048 for 50/101/152) and
(b) torch state_dicts can be imported for numerical-parity checks.

TPU-native choices:
  * NHWC data layout end-to-end (XLA's native conv layout on TPU);
  * convolutions run in bfloat16 under AMP with fp32 parameters;
  * BatchNorm statistics always in fp32, optionally psum-synced across the
    data mesh axis (``axis_name``) — an upgrade over per-rank DDP stats;
  * optional ``remat`` per stage to trade FLOPs for HBM.

Architecture facts mirrored from torchvision (not its code): 7x7/s2 stem,
3x3/s2 maxpool, 4 stages of BasicBlock (18/34) or Bottleneck (50/101/152)
with stride on the 3x3 (v1.5), kaiming-normal fan-out conv init, BN ones/
zeros, global average pool.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

conv_kernel_init = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal")  # kaiming_normal(mode=fan_out, relu)


class ConvBN(nn.Module):
    """Conv(bias=False) + BatchNorm, the repeated ResNet cell."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    # Default is torch Conv2d padding=k//2 (symmetric).  XLA "SAME" pads
    # asymmetrically for even inputs under stride 2 — pad (0,1) where torch
    # pads (1,1) — shifting every strided conv's sampling grid one pixel,
    # which breaks bit-parity with torch-pretrained weights.
    padding: Any = None
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        padding = self.padding
        if padding is None:
            padding = [(k // 2, k // 2) for k in self.kernel_size]
        if self.kernel_size == (1, 1):
            # Pointwise convs as explicit 2-D GEMMs.  As conv ops their
            # weight-gradient lowers to a VPU convert+reduce fusion with
            # ~3.6x the necessary HBM bytes (trace: ~22 ms/step across the
            # RN50 backward at bs128); as (B*H*W, Cin) x (Cin, Cout) dots
            # the whole bwd runs on the MXU.  A strided 1x1 conv (pad 0)
            # is exactly subsample-then-matmul.  The param keeps the conv
            # path/shape ("conv/kernel", (1, 1, Cin, Cout)) so
            # checkpoints, torch import/export, and D2 export see no
            # difference.
            kernel = _ConvKernel((1, 1, x.shape[-1], self.features),
                                 name="conv")()
            xd = x.astype(self.dtype)
            sh, sw = self.strides
            if (sh, sw) != (1, 1):
                xd = xd[:, ::sh, ::sw, :]
            b, h, w, c = xd.shape
            y = jnp.dot(xd.reshape(b * h * w, c),
                        kernel[0, 0].astype(self.dtype),
                        preferred_element_type=self.dtype)
            x = y.reshape(b, h, w, self.features)
        else:
            x = nn.Conv(
                self.features,
                self.kernel_size,
                strides=self.strides,
                padding=padding,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=conv_kernel_init,
                name="conv",
            )(x.astype(self.dtype))
        # BN stays in the compute dtype: flax computes the batch statistics
        # in fp32 internally regardless (and running stats are stored fp32),
        # so keeping the activation tensor bf16 end-to-end halves the BN
        # HBM traffic without changing the statistics' precision.  (Round 1
        # round-tripped every activation through fp32 here — a major
        # bandwidth sink on the memory-bound BN+ReLU passes.)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.bn_axis_name,
            name="bn",
        )(x)
        return x


def _space_to_depth_nhwc(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C) with channel order (di, dj, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _space_to_depth_kernel(k: jax.Array) -> jax.Array:
    """Rewrite a (7,7,Cin,Cout) stride-2 stem kernel for 2x2 space-to-depth
    input: zero-pad the leading row/col to (8,8) and fold the 2x2 phase into
    the input channels -> (4,4,4*Cin,Cout).  Mathematically exact (MLPerf
    ResNet trick): output(i,j) of conv7x7/s2/pad3 covers input rows
    2i-3..2i+3, i.e. s2d rows i-2..i+1 — a 4x4/s1 window with pad (2,1)."""
    k = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
    kh, kw, ci, co = k.shape
    k = k.reshape(kh // 2, 2, kw // 2, 2, ci, co)
    k = k.transpose(0, 2, 1, 3, 4, 5)
    return k.reshape(kh // 2, kw // 2, 4 * ci, co)


class _ConvKernel(nn.Module):
    """Bare conv-kernel parameter holder so the space-to-depth stem keeps
    the exact param path (``stem/conv/kernel``) of the plain ``ConvBN``."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("kernel", conv_kernel_init, self.shape,
                          jnp.float32)


class SpaceToDepthStem(nn.Module):
    """The ResNet stem conv computed in space-to-depth form.

    Declares the identical (7,7,Cin,64) parameter at the identical path as
    the plain stem (so torch import/export, checkpoints, and the
    Detectron2 export are all unaffected) but computes the equivalent
    4x4/s1 convolution over the 2x2 space-to-depth input — the 7x7/s2
    3-channel form underutilizes the MXU (im2col depth 147 with C=3) and
    its backward is stride-dilated.  Measured ~0.5 ms/step faster on TPU
    v5e at bs128 (round-2 trace campaign, docs/PERF_NOTES.md).
    """

    features: int = 64
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        cin = x.shape[-1]
        kernel = _ConvKernel((7, 7, cin, self.features), name="conv")()
        xs = _space_to_depth_nhwc(x.astype(self.dtype))
        ks = _space_to_depth_kernel(kernel).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            xs, ks, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32,
            axis_name=self.bn_axis_name, name="bn")(y)
        return y


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection shortcut (resnet18/34)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        cbn = partial(ConvBN, dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        residual = x
        y = cbn(self.features, (3, 3), self.strides, name="block1")(x, train)
        y = nn.relu(y)
        y = cbn(self.features, (3, 3), name="block2")(y, train)
        if self.downsample:
            residual = cbn(self.features, (1, 1), self.strides,
                           name="shortcut")(x, train)
        return nn.relu(y + residual.astype(y.dtype))


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) bottleneck (resnet50/101/152)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        cbn = partial(ConvBN, dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        residual = x
        y = cbn(self.features, (1, 1), name="block1")(x, train)
        y = nn.relu(y)
        y = cbn(self.features, (3, 3), self.strides, name="block2")(y, train)
        y = nn.relu(y)
        y = cbn(self.features * self.expansion, (1, 1), name="block3")(y, train)
        if self.downsample:
            residual = cbn(self.features * self.expansion, (1, 1),
                           self.strides, name="shortcut")(x, train)
        return nn.relu(y + residual.astype(y.dtype))


class ResNet(nn.Module):
    """Generic torchvision-style ResNet returning pooled features.

    Output is (B, feature_size): 512 x block expansion — the tensor the
    reference's ImageEncoder produces after fc=Identity
    (reference: encoder.py:41,63-65).
    """

    stage_sizes: Sequence[int]
    block_cls: type = Bottleneck
    num_classes: Optional[int] = None  # None = feature extractor (fc chopped)
    dtype_name: str = "float32"
    bn_axis_name: Optional[str] = None
    remat: bool = False
    space_to_depth: bool = True  # exact-math stem rewrite (see SpaceToDepthStem)
    # Base channel width (stage c = width * 2**c).  64 reproduces the
    # torchvision family; smaller values give architecture-faithful tiny
    # models for CI/dryrun (MODEL.VISUAL.WIDTH).
    width: int = 64

    @property
    def feature_size(self) -> int:
        expansion = 4 if self.block_cls is Bottleneck else 1
        return self.width * (2 ** (len(self.stage_sizes) - 1)) * expansion

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        dtype = jnp.bfloat16 if self.dtype_name == "bfloat16" else jnp.float32
        # Stem: 7x7/s2 + BN/ReLU + 3x3/s2 maxpool.  When the spatial dims
        # are even (always, for the 224/crop sizes used here) the stem conv
        # runs in its exact space-to-depth form.
        if self.space_to_depth and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = SpaceToDepthStem(self.width, dtype=dtype,
                                 bn_axis_name=self.bn_axis_name,
                                 name="stem")(x, train)
        else:
            x = ConvBN(self.width, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                       dtype=dtype, bn_axis_name=self.bn_axis_name,
                       name="stem")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = self.block_cls
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        expansion = 4 if self.block_cls is Bottleneck else 1

        for stage, num_blocks in enumerate(self.stage_sizes):
            features = self.width * (2 ** stage)
            for blk in range(num_blocks):
                strides = (2, 2) if stage > 0 and blk == 0 else (1, 1)
                needs_proj = blk == 0 and (
                    stage > 0 or expansion != 1
                )
                x = block_cls(
                    features=features,
                    strides=strides,
                    downsample=needs_proj,
                    dtype=dtype,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{stage + 1}_{blk}",
                )(x, train)

        # Global average pool over spatial dims -> (B, C).
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if self.num_classes is not None:
            from clip_lite_tpu.ops.layers import Linear

            x = Linear(self.num_classes, dtype=jnp.float32, name="fc")(x)
        return x


def resnet18(**kw) -> ResNet:
    return ResNet(stage_sizes=[2, 2, 2, 2], block_cls=BasicBlock, **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(stage_sizes=[3, 4, 6, 3], block_cls=BasicBlock, **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(stage_sizes=[3, 4, 6, 3], block_cls=Bottleneck, **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(stage_sizes=[3, 4, 23, 3], block_cls=Bottleneck, **kw)


def resnet152(**kw) -> ResNet:
    return ResNet(stage_sizes=[3, 8, 36, 3], block_cls=Bottleneck, **kw)


RESNETS = {
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "resnet152": resnet152,
}


# ---------------------------------------------------------------------------
# Torch state_dict import (numerical parity / checkpoint migration).
# ---------------------------------------------------------------------------

def _torch_conv_to_flax(w):
    """(out, in, kh, kw) -> (kh, kw, in, out)."""
    return jnp.asarray(w).transpose(2, 3, 1, 0)


def import_torch_resnet_state_dict(state_dict, stage_sizes) -> dict:
    """Convert a torchvision-layout ResNet state_dict (tensors or ndarrays,
    keys like ``layer1.0.conv1.weight``) into this module's param pytrees.

    Returns {"params": ..., "batch_stats": ...}.
    """
    import numpy as np

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(leaf)

    def convert_convbn(src_conv, src_bn, dst):
        put(params, dst + ["conv", "kernel"], _torch_conv_to_flax(sd[src_conv + ".weight"]))
        put(params, dst + ["bn", "scale"], sd[src_bn + ".weight"])
        put(params, dst + ["bn", "bias"], sd[src_bn + ".bias"])
        put(stats, dst + ["bn", "mean"], sd[src_bn + ".running_mean"])
        put(stats, dst + ["bn", "var"], sd[src_bn + ".running_var"])

    convert_convbn("conv1", "bn1", ["stem"])
    bottleneck = any(f"layer1.0.conv3.weight" in k for k in sd)
    n_convs = 3 if f"layer1.0.conv3.weight" in sd else 2
    for stage, num_blocks in enumerate(stage_sizes, start=1):
        for blk in range(num_blocks):
            src = f"layer{stage}.{blk}"
            dst = [f"layer{stage}_{blk}"]
            for ci in range(1, n_convs + 1):
                convert_convbn(f"{src}.conv{ci}", f"{src}.bn{ci}",
                               dst + [f"block{ci}"])
            if f"{src}.downsample.0.weight" in sd:
                convert_convbn(f"{src}.downsample.0", f"{src}.downsample.1",
                               dst + ["shortcut"])
    if "fc.weight" in sd:
        put(params, ["fc", "kernel"], np.asarray(sd["fc.weight"]).T)
        put(params, ["fc", "bias"], sd["fc.bias"])
    return {"params": params, "batch_stats": stats}


def export_torch_resnet_state_dict(variables, stage_sizes) -> dict:
    """Inverse of :func:`import_torch_resnet_state_dict`: emit a
    torchvision-layout state_dict (numpy arrays) from Flax variables.
    Used by the Detectron2 backbone export (reference: encoder.py:67-112).
    """
    import numpy as np

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: dict = {}

    def get(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node)

    def convert_convbn(dst_conv, dst_bn, src):
        out[dst_conv + ".weight"] = get(params, src + ["conv", "kernel"]).transpose(3, 2, 0, 1)
        out[dst_bn + ".weight"] = get(params, src + ["bn", "scale"])
        out[dst_bn + ".bias"] = get(params, src + ["bn", "bias"])
        out[dst_bn + ".running_mean"] = get(stats, src + ["bn", "mean"])
        out[dst_bn + ".running_var"] = get(stats, src + ["bn", "var"])

    convert_convbn("conv1", "bn1", ["stem"])
    for stage, num_blocks in enumerate(stage_sizes, start=1):
        for blk in range(num_blocks):
            dst = f"layer{stage}.{blk}"
            src = [f"layer{stage}_{blk}"]
            ci = 1
            while f"block{ci}" in params[src[0]]:
                convert_convbn(f"{dst}.conv{ci}", f"{dst}.bn{ci}",
                               src + [f"block{ci}"])
                ci += 1
            if "shortcut" in params[src[0]]:
                convert_convbn(f"{dst}.downsample.0", f"{dst}.downsample.1",
                               src + ["shortcut"])
    return out
