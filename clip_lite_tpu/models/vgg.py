"""VGG image towers in Flax (torchvision layout).

Supported as a visual backbone option by the reference
(reference: config.py:113, encoder.py:3).  Note a reference quirk preserved
here: for VGG, ``ImageEncoder``'s ``fc = Identity`` assignment
(encoder.py:41) does nothing — torchvision VGG's head is ``classifier``,
not ``fc`` — so the encoder emits the 1000-d classifier output.  We mirror
that: VGG backbones keep their classifier MLP and emit ``num_classes``
features.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from clip_lite_tpu.ops.layers import Linear

_CFGS = {
    "vgg11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"],
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


class VGG(nn.Module):
    cfg: Sequence[Union[int, str]]
    batch_norm: bool = False
    num_classes: Optional[int] = 1000
    dropout_rate: float = 0.5
    dtype_name: str = "float32"
    bn_axis_name: Optional[str] = None

    @property
    def feature_size(self) -> int:
        return self.num_classes if self.num_classes else 4096

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        dtype = jnp.bfloat16 if self.dtype_name == "bfloat16" else jnp.float32
        conv_i = 0
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(v, (3, 3), padding=1, dtype=dtype,
                        param_dtype=jnp.float32,
                        name=f"conv{conv_i}")(x.astype(dtype))
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 param_dtype=jnp.float32,
                                 axis_name=self.bn_axis_name,
                                 name=f"bn{conv_i}")(x.astype(jnp.float32))
                x = x.astype(dtype)
            x = nn.relu(x)
            conv_i += 1
        # torchvision adaptively pools to 7x7; with 224 input the feature
        # map is already 7x7, so this is the identity there.
        b, h, w, c = x.shape
        if (h, w) != (7, 7):
            x = jax.image.resize(x.astype(jnp.float32), (b, 7, 7, c),
                                 method="linear").astype(dtype)
        x = x.reshape(b, -1)
        x = nn.relu(Linear(4096, dtype=dtype, name="fc1")(x))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.relu(Linear(4096, dtype=dtype, name="fc2")(x))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        if self.num_classes:
            x = Linear(self.num_classes, dtype=jnp.float32, name="fc3")(x)
        return x.astype(jnp.float32)


def _make(name: str, bn: bool):
    def ctor(**kw):
        return VGG(cfg=_CFGS[name], batch_norm=bn, **kw)
    return ctor


VGGS = {name: _make(name, False) for name in _CFGS}
VGGS.update({f"{name}_bn": _make(name, True) for name in _CFGS})
