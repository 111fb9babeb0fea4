"""Standalone model zoo: CIFAR-scale backbones + distillation heads.

Flax re-implementations of the reference's model_zoo surface
(reference: model_zoo/__init__.py:10-37 — the CRD-style collection:
CIFAR ResNets, ResNetV2, WideResNet, CIFAR VGG-BN, MobileNetV2-0.5x,
ShuffleNetV1/V2, classifier heads, and distillation regressors).  These
are standard published architectures written TPU-first: NHWC, fused
conv+BN cells, fp32 stats, optional ``return_features`` exposing per-stage
activations for distillation (the reference's ``is_feat`` convention).

All entries register in ``model_dict`` and (backbones) in the visual
backbone registry as ``zoo::<name>``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from clip_lite_tpu.ops.layers import Linear

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    # None = torch Conv2d padding=k//2 (symmetric both sides).  "SAME" is
    # asymmetric under stride 2 (pads (0,1) vs torch (1,1)), shifting the
    # sampling grid of strided convs vs torch-pretrained weights.
    padding: Any = None
    groups: int = 1
    use_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        padding = self.padding
        if padding is None:
            padding = [(k // 2, k // 2) for k in self.kernel]
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=padding, feature_group_count=self.groups,
                    use_bias=False, kernel_init=conv_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x.astype(self.dtype))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32,
                         name="bn")(x.astype(jnp.float32))
        x = x.astype(self.dtype)
        return nn.relu(x) if self.use_relu else x


# ---------------------------------------------------------------------------
# CIFAR ResNet (He et al.): depth = 6n+2, 3 stages.
# ---------------------------------------------------------------------------

class CifarBasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = ConvBN(self.features, strides=self.strides, dtype=self.dtype,
                   name="c1")(x, train)
        y = ConvBN(self.features, use_relu=False, dtype=self.dtype,
                   name="c2")(y, train)
        if x.shape[-1] != self.features or self.strides != (1, 1):
            x = ConvBN(self.features, kernel=(1, 1), strides=self.strides,
                       use_relu=False, dtype=self.dtype, name="shortcut")(
                x, train)
        return nn.relu(y + x)


class CifarResNet(nn.Module):
    depth: int
    filters: Sequence[int] = (16, 16, 32, 64)
    num_classes: int = 100
    dtype_name: str = "float32"

    @property
    def feature_size(self) -> int:
        return self.filters[3]

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False):
        dtype = jnp.bfloat16 if self.dtype_name == "bfloat16" else jnp.float32
        assert (self.depth - 2) % 6 == 0, "CIFAR ResNet depth must be 6n+2"
        n = (self.depth - 2) // 6
        feats: List[jax.Array] = []
        x = ConvBN(self.filters[0], dtype=dtype, name="stem")(x, train)
        feats.append(x)
        for stage in range(3):
            for blk in range(n):
                strides = (2, 2) if stage > 0 and blk == 0 else (1, 1)
                x = CifarBasicBlock(self.filters[stage + 1], strides,
                                    dtype=dtype,
                                    name=f"layer{stage + 1}_{blk}")(x, train)
            feats.append(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        feats.append(x)
        logits = Linear(self.num_classes, name="fc")(x) \
            if self.num_classes else x
        return (feats, logits) if return_features else logits


# ---------------------------------------------------------------------------
# ResNetV2 (ImageNet-style blocks with 3x3 CIFAR stem; CRD resnetv2.py)
# ---------------------------------------------------------------------------

class V2Bottleneck(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        out_f = self.features * 4
        y = ConvBN(self.features, kernel=(1, 1), dtype=self.dtype,
                   name="c1")(x, train)
        y = ConvBN(self.features, strides=self.strides, dtype=self.dtype,
                   name="c2")(y, train)
        y = ConvBN(out_f, kernel=(1, 1), use_relu=False, dtype=self.dtype,
                   name="c3")(y, train)
        if x.shape[-1] != out_f or self.strides != (1, 1):
            x = ConvBN(out_f, kernel=(1, 1), strides=self.strides,
                       use_relu=False, dtype=self.dtype,
                       name="shortcut")(x, train)
        return nn.relu(y + x)


class ResNetV2(nn.Module):
    stage_sizes: Sequence[int]
    num_classes: int = 100
    dtype_name: str = "float32"

    @property
    def feature_size(self) -> int:
        return 512 * 4

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False):
        dtype = jnp.bfloat16 if self.dtype_name == "bfloat16" else jnp.float32
        feats: List[jax.Array] = []
        x = ConvBN(64, dtype=dtype, name="stem")(x, train)
        feats.append(x)
        for stage, blocks in enumerate(self.stage_sizes):
            for blk in range(blocks):
                strides = (2, 2) if stage > 0 and blk == 0 else (1, 1)
                x = V2Bottleneck(64 * 2 ** stage, strides, dtype=dtype,
                                 name=f"layer{stage + 1}_{blk}")(x, train)
            feats.append(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        feats.append(x)
        logits = Linear(self.num_classes, name="fc")(x) \
            if self.num_classes else x
        return (feats, logits) if return_features else logits


# ---------------------------------------------------------------------------
# Wide ResNet (Zagoruyko & Komodakis): depth = 6n+4, pre-activation.
# ---------------------------------------------------------------------------

class WRNBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32,
                         name="bn1")(x.astype(jnp.float32))
        h = nn.relu(h).astype(self.dtype)
        y = nn.Conv(self.features, (3, 3), strides=self.strides,
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(h)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32,
                         name="bn2")(y.astype(jnp.float32))
        y = nn.relu(y).astype(self.dtype)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=conv_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(y)
        if x.shape[-1] != self.features or self.strides != (1, 1):
            x = nn.Conv(self.features, (1, 1), strides=self.strides,
                        use_bias=False, kernel_init=conv_init,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="shortcut")(h)
        return y + x


class WideResNet(nn.Module):
    depth: int
    widen: int
    num_classes: int = 100
    dtype_name: str = "float32"

    @property
    def feature_size(self) -> int:
        return 64 * self.widen

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False):
        dtype = jnp.bfloat16 if self.dtype_name == "bfloat16" else jnp.float32
        assert (self.depth - 4) % 6 == 0, "WRN depth must be 6n+4"
        n = (self.depth - 4) // 6
        widths = [16, 16 * self.widen, 32 * self.widen, 64 * self.widen]
        feats: List[jax.Array] = []
        x = nn.Conv(widths[0], (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=conv_init, dtype=dtype,
                    param_dtype=jnp.float32, name="stem")(x.astype(dtype))
        feats.append(x)
        for stage in range(3):
            for blk in range(n):
                strides = (2, 2) if stage > 0 and blk == 0 else (1, 1)
                x = WRNBlock(widths[stage + 1], strides, dtype=dtype,
                             name=f"layer{stage + 1}_{blk}")(x, train)
            feats.append(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32,
                         name="final_bn")(x.astype(jnp.float32))
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        feats.append(x)
        logits = Linear(self.num_classes, name="fc")(x) \
            if self.num_classes else x
        return (feats, logits) if return_features else logits


# ---------------------------------------------------------------------------
# CIFAR VGG-BN (vgg8..19): conv stages + single FC head.
# ---------------------------------------------------------------------------

_ZOO_VGG_CFGS = {
    8: [64, "M", 128, "M", 256, "M", 512, "M", 512, "M"],
    11: [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    13: [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
         512, 512, "M"],
    16: [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
         512, 512, 512, "M"],
    19: [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
         512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


class CifarVGG(nn.Module):
    depth: int
    num_classes: int = 100
    dtype_name: str = "float32"

    @property
    def feature_size(self) -> int:
        return 512

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False):
        dtype = jnp.bfloat16 if self.dtype_name == "bfloat16" else jnp.float32
        feats: List[jax.Array] = []
        ci = 0
        for v in _ZOO_VGG_CFGS[self.depth]:
            if v == "M":
                if x.shape[1] > 1:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                feats.append(x)
            else:
                x = ConvBN(v, dtype=dtype, name=f"conv{ci}")(x, train)
                ci += 1
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        feats.append(x)
        logits = Linear(self.num_classes, name="fc")(x) \
            if self.num_classes else x
        return (feats, logits) if return_features else logits


# ---------------------------------------------------------------------------
# MobileNetV2 (width 0.5, "mobile_half") — inverted residuals, T=6.
# ---------------------------------------------------------------------------

class InvertedResidual(nn.Module):
    features: int
    strides: Tuple[int, int]
    expand: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_f = x.shape[-1]
        hidden = in_f * self.expand
        y = x
        if self.expand != 1:
            y = ConvBN(hidden, kernel=(1, 1), dtype=self.dtype,
                       name="expand")(y, train)
        y = ConvBN(hidden, strides=self.strides, groups=hidden,
                   dtype=self.dtype, name="depthwise")(y, train)
        y = ConvBN(self.features, kernel=(1, 1), use_relu=False,
                   dtype=self.dtype, name="project")(y, train)
        if self.strides == (1, 1) and in_f == self.features:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    width_mult: float = 0.5
    expand: int = 6
    num_classes: int = 100
    dtype_name: str = "float32"

    # (expansion, out_channels, num_blocks, stride) — standard MBv2 table.
    SETTINGS = [(1, 16, 1, 1), (6, 24, 2, 1), (6, 32, 3, 2), (6, 64, 4, 2),
                (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]

    @property
    def feature_size(self) -> int:
        return max(1280, int(1280 * self.width_mult))

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False):
        dtype = jnp.bfloat16 if self.dtype_name == "bfloat16" else jnp.float32
        w = lambda c: max(8, int(c * self.width_mult))
        feats: List[jax.Array] = []
        x = ConvBN(w(32), strides=(1, 1), dtype=dtype, name="stem")(x, train)
        feats.append(x)
        bi = 0
        for t, c, n, s in self.SETTINGS:
            for i in range(n):
                strides = (s, s) if i == 0 else (1, 1)
                x = InvertedResidual(w(c), strides, t if bi else 1,
                                     dtype=dtype, name=f"block{bi}")(x, train)
                bi += 1
            feats.append(x)
        x = ConvBN(self.feature_size, kernel=(1, 1), dtype=dtype,
                   name="head")(x, train)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        feats.append(x)
        logits = Linear(self.num_classes, name="fc")(x) \
            if self.num_classes else x
        return (feats, logits) if return_features else logits


# ---------------------------------------------------------------------------
# ShuffleNet V1 / V2 (channel shuffle).
# ---------------------------------------------------------------------------

def channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = x.transpose(0, 1, 2, 4, 3)
    return x.reshape(b, h, w, c)


class ShuffleV1Block(nn.Module):
    features: int
    strides: Tuple[int, int]
    groups: int
    first: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_f = x.shape[-1]
        mid = self.features // 4
        g = 1 if self.first else self.groups
        down = self.strides == (2, 2)
        out_f = self.features - in_f if down else self.features

        y = ConvBN(mid, kernel=(1, 1), groups=g, dtype=self.dtype,
                   name="gconv1")(x, train)
        y = channel_shuffle(y, self.groups)
        y = ConvBN(mid, strides=self.strides, groups=mid, use_relu=False,
                   dtype=self.dtype, name="depthwise")(y, train)
        y = ConvBN(out_f, kernel=(1, 1), groups=self.groups, use_relu=False,
                   dtype=self.dtype, name="gconv2")(y, train)
        if down:
            x = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
            return nn.relu(jnp.concatenate([x.astype(y.dtype), y], axis=-1))
        return nn.relu(x.astype(y.dtype) + y)


class ShuffleNetV1(nn.Module):
    groups: int = 2
    num_classes: int = 100
    dtype_name: str = "float32"
    out_channels = {1: (144, 288, 576), 2: (200, 400, 800),
                    3: (240, 480, 960), 4: (272, 544, 1088),
                    8: (384, 768, 1536)}
    stage_blocks = (4, 8, 4)

    @property
    def feature_size(self) -> int:
        return self.out_channels[self.groups][2]

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False):
        dtype = jnp.bfloat16 if self.dtype_name == "bfloat16" else jnp.float32
        widths = self.out_channels[self.groups]
        feats: List[jax.Array] = []
        x = ConvBN(24, kernel=(1, 1), dtype=dtype, name="stem")(x, train)
        feats.append(x)
        for stage, (width, blocks) in enumerate(
                zip(widths, self.stage_blocks)):
            for blk in range(blocks):
                strides = (2, 2) if blk == 0 else (1, 1)
                x = ShuffleV1Block(width, strides, self.groups,
                                   first=(stage == 0 and blk == 0),
                                   dtype=dtype,
                                   name=f"stage{stage}_{blk}")(x, train)
            feats.append(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        feats.append(x)
        logits = Linear(self.num_classes, name="fc")(x) \
            if self.num_classes else x
        return (feats, logits) if return_features else logits


class ShuffleV2Block(nn.Module):
    features: int
    down: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.down:
            left, right = x, x
        else:
            c = x.shape[-1] // 2
            left, right = x[..., :c], x[..., c:]
        out_half = self.features // 2

        r = ConvBN(out_half, kernel=(1, 1), dtype=self.dtype,
                   name="r1")(right, train)
        r = ConvBN(out_half, strides=(2, 2) if self.down else (1, 1),
                   groups=out_half, use_relu=False, dtype=self.dtype,
                   name="rdw")(r, train)
        r = ConvBN(out_half, kernel=(1, 1), dtype=self.dtype,
                   name="r2")(r, train)
        if self.down:
            l = ConvBN(left.shape[-1], strides=(2, 2), groups=left.shape[-1],
                       use_relu=False, dtype=self.dtype, name="ldw")(left, train)
            l = ConvBN(out_half, kernel=(1, 1), dtype=self.dtype,
                       name="l2")(l, train)
        else:
            l = left.astype(r.dtype)
        out = jnp.concatenate([l, r], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2(nn.Module):
    size: float = 1.0
    num_classes: int = 100
    dtype_name: str = "float32"
    configs = {0.5: (48, 96, 192, 1024), 1.0: (116, 232, 464, 1024),
               1.5: (176, 352, 704, 1024), 2.0: (224, 488, 976, 2048)}
    stage_blocks = (3, 7, 3)

    @property
    def feature_size(self) -> int:
        return self.configs[self.size][3]

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False):
        dtype = jnp.bfloat16 if self.dtype_name == "bfloat16" else jnp.float32
        c1, c2, c3, head = self.configs[self.size]
        feats: List[jax.Array] = []
        x = ConvBN(24, dtype=dtype, name="stem")(x, train)
        feats.append(x)
        for stage, (width, blocks) in enumerate(
                zip((c1, c2, c3), self.stage_blocks)):
            x = ShuffleV2Block(width, down=True, dtype=dtype,
                               name=f"stage{stage}_down")(x, train)
            for blk in range(blocks):
                x = ShuffleV2Block(width, dtype=dtype,
                                   name=f"stage{stage}_{blk}")(x, train)
            feats.append(x)
        x = ConvBN(head, kernel=(1, 1), dtype=dtype, name="head")(x, train)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        feats.append(x)
        logits = Linear(self.num_classes, name="fc")(x) \
            if self.num_classes else x
        return (feats, logits) if return_features else logits


# ---------------------------------------------------------------------------
# Classifier heads + distillation regressors (reference: classifier.py,
# util.py — the CRD auxiliary module surface).
# ---------------------------------------------------------------------------

class LinearClassifierHead(nn.Module):
    num_classes: int = 100

    @nn.compact
    def __call__(self, x, train: bool = True):
        return Linear(self.num_classes, name="fc")(x)


class NonLinearClassifierHead(nn.Module):
    num_classes: int = 100
    hidden: int = 200

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.relu(Linear(self.hidden, name="fc1")(x))
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return Linear(self.num_classes, name="fc2")(x)


class Conv4(nn.Module):
    """4-conv probe network."""

    num_classes: int = 100

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, f in enumerate([64, 64, 64, 64]):
            x = ConvBN(f, strides=(2, 2) if i > 0 else (1, 1),
                       name=f"conv{i}")(x, train)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return Linear(self.num_classes, name="fc")(x)


class Conv4MP(nn.Module):
    num_classes: int = 100

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, f in enumerate([64, 64, 64, 64]):
            x = ConvBN(f, name=f"conv{i}")(x, train)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return Linear(self.num_classes, name="fc")(x)


class Embed(nn.Module):
    """Linear embed + L2 normalize (distillation projection)."""

    dim_out: int = 128

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = Linear(self.dim_out, name="linear")(x)
        from clip_lite_tpu.ops.layers import l2_normalize

        return l2_normalize(x)


class LinearEmbed(nn.Module):
    dim_out: int = 128

    @nn.compact
    def __call__(self, x):
        return Linear(self.dim_out, name="linear")(x.reshape(x.shape[0], -1))


class MLPEmbed(nn.Module):
    dim_out: int = 128

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(Linear(2 * self.dim_out, name="fc1")(x))
        x = Linear(self.dim_out, name="fc2")(x)
        from clip_lite_tpu.ops.layers import l2_normalize

        return l2_normalize(x)


class ConvReg(nn.Module):
    """Conv regressor matching a student feature map to a teacher's
    (shape adaptation for hint-based distillation)."""

    out_channels: int
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = ConvBN(self.out_channels, use_relu=self.use_relu,
                   name="reg")(x, train)
        return y


class Regress(nn.Module):
    dim_out: int = 128

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        return nn.relu(Linear(self.dim_out, name="linear")(x))


class Paraphraser(nn.Module):
    """Factor-transfer teacher-side autoencoder: 3 conv encoder to k x C
    channels + 3 conv decoder (reference: model_zoo/util.py Paraphraser)."""

    k: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = x.shape[-1]
        mid = max(8, int(round(c * self.k)))
        h = x
        for i, f in enumerate([c, mid, mid]):
            h = ConvBN(f, name=f"enc{i}")(h, train)
        factors = h
        for i, f in enumerate([mid, c, c]):
            h = ConvBN(f, name=f"dec{i}")(h, train)
        return factors, h


class Translator(nn.Module):
    """Factor-transfer student-side encoder to the teacher factor space."""

    k: float = 0.5
    out_channels: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = max(8, int(round(self.out_channels * self.k)))
        h = x
        for i, f in enumerate([self.out_channels, mid, mid]):
            h = ConvBN(f, name=f"t{i}")(h, train)
        return h


class Connector(nn.Module):
    """1x1-conv feature adapter between student/teacher stages."""

    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        return ConvBN(self.out_channels, kernel=(1, 1), use_relu=False,
                      name="conn")(x, train)


class PoolEmbed(nn.Module):
    """Adaptive-pool a feature map then embed + normalize."""

    dim_out: int = 128
    pool_size: int = 4

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x.astype(jnp.float32),
                             (b, self.pool_size, self.pool_size, c),
                             method="linear")
        x = Linear(self.dim_out, name="linear")(x.reshape(b, -1))
        from clip_lite_tpu.ops.layers import l2_normalize

        return l2_normalize(x)


def flatten_features(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1)


# ---------------------------------------------------------------------------
# Registry (reference: model_zoo/__init__.py:10-37).
# ---------------------------------------------------------------------------

def _cifar_resnet(depth, filters=(16, 16, 32, 64)):
    return lambda **kw: CifarResNet(depth=depth, filters=filters, **kw)


model_dict: dict = {
    "resnet8": _cifar_resnet(8),
    "resnet14": _cifar_resnet(14),
    "resnet20": _cifar_resnet(20),
    "resnet32": _cifar_resnet(32),
    "resnet44": _cifar_resnet(44),
    "resnet56": _cifar_resnet(56),
    "resnet110": _cifar_resnet(110),
    "resnet8x4": _cifar_resnet(8, (32, 64, 128, 256)),
    "resnet32x4": _cifar_resnet(32, (32, 64, 128, 256)),
    "ResNet50": lambda **kw: ResNetV2(stage_sizes=[3, 4, 6, 3], **kw),
    "wrn_16_1": lambda **kw: WideResNet(depth=16, widen=1, **kw),
    "wrn_16_2": lambda **kw: WideResNet(depth=16, widen=2, **kw),
    "wrn_40_1": lambda **kw: WideResNet(depth=40, widen=1, **kw),
    "wrn_40_2": lambda **kw: WideResNet(depth=40, widen=2, **kw),
    "vgg8": lambda **kw: CifarVGG(depth=8, **kw),
    "vgg11": lambda **kw: CifarVGG(depth=11, **kw),
    "vgg13": lambda **kw: CifarVGG(depth=13, **kw),
    "vgg16": lambda **kw: CifarVGG(depth=16, **kw),
    "vgg19": lambda **kw: CifarVGG(depth=19, **kw),
    "MobileNetV2": lambda **kw: MobileNetV2(width_mult=0.5, **kw),
    "ShuffleV1": lambda **kw: ShuffleNetV1(**kw),
    "ShuffleV2": lambda **kw: ShuffleNetV2(**kw),
    "LinearClassifier": LinearClassifierHead,
    "NonLinearClassifier": NonLinearClassifierHead,
    "Conv4": Conv4,
    "Conv4MP": Conv4MP,
}


def register_zoo_backbones() -> None:
    """Expose zoo backbones to the visual-encoder registry as
    ``zoo::<name>`` feature extractors."""
    from clip_lite_tpu.models.image_encoder import register_backbone

    for name, ctor in model_dict.items():
        if name in ("LinearClassifier", "NonLinearClassifier",
                    "Conv4", "Conv4MP"):
            continue
        def make(c):
            def build(**kw):
                # Zoo models keep per-device BN stats (no sync-BN support).
                kw.pop("bn_axis_name", None)
                return c(num_classes=None, **kw)
            return build

        register_backbone(f"zoo::{name}", make(ctor))


register_zoo_backbones()
