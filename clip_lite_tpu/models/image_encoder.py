"""Image tower wrapper: any registered backbone by name, classifier chopped.

Equivalent of the reference's ImageEncoder (reference: encoder.py:13-112):
``getattr(torchvision.models, name)`` becomes a registry lookup over our
Flax backbones; ``fc = nn.Identity()`` becomes ``num_classes=None`` feature
extraction; ``frozen`` becomes a ``stop_gradient`` + eval-mode BN wrapper
(JAX has no requires_grad — freezing is expressed in the computation).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from clip_lite_tpu.models.resnet import (
    RESNETS,
    export_torch_resnet_state_dict,
    import_torch_resnet_state_dict,
)
from clip_lite_tpu.models.vgg import VGGS

BACKBONES: Dict[str, Any] = {}
BACKBONES.update(RESNETS)
BACKBONES.update(VGGS)


def register_backbone(name: str, ctor) -> None:
    """Extend the visual backbone registry (used by models.zoo)."""
    BACKBONES[name] = ctor


class ImageEncoder(nn.Module):
    """Maps a batch of NHWC images to (B, feature_size) embeddings."""

    img_enc_net: str = "resnet50"
    frozen: bool = False
    dtype_name: str = "float32"
    bn_mode: str = "local"  # {"local", "sync"}
    data_axis: str = "data"
    remat: bool = False  # per-block rematerialization (ResNets only)
    width: int = 64  # ResNet base channel width (MODEL.VISUAL.WIDTH)

    def setup(self):
        if self.img_enc_net not in BACKBONES:
            raise KeyError(
                f"Unknown visual backbone {self.img_enc_net!r}. "
                f"Choices: {sorted(BACKBONES)}"
            )
        kwargs: Dict[str, Any] = dict(
            dtype_name=self.dtype_name,
            bn_axis_name=self.data_axis if self.bn_mode == "sync" else None,
        )
        if self.img_enc_net in RESNETS:
            kwargs["num_classes"] = None  # feature extractor (fc chopped)
            kwargs["remat"] = self.remat
            kwargs["width"] = self.width
        self.backbone = BACKBONES[self.img_enc_net](**kwargs)

    @property
    def feature_size(self) -> int:
        return self.backbone.feature_size

    def __call__(self, image: jax.Array, train: bool = True) -> jax.Array:
        """image: (B, H, W, 3) NHWC float. Returns (B, feature_size) fp32."""
        if self.frozen:
            feats = self.backbone(image, train=False)
            feats = jax.lax.stop_gradient(feats)
        else:
            feats = self.backbone(image, train=train)
        return feats.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Detectron2 export (reference: encoder.py:67-112).
# ---------------------------------------------------------------------------

_DETECTRON2_RENAME = {
    "layer1": "res2",
    "layer2": "res3",
    "layer3": "res4",
    "layer4": "res5",
    "bn1": "conv1.norm",
    "bn2": "conv2.norm",
    "bn3": "conv3.norm",
    "downsample.0": "shortcut",
    "downsample.1": "shortcut.norm",
}


def detectron2_backbone_state_dict(variables, network_name: str) -> dict:
    """Export a trained ResNet tower as a Detectron2-loadable checkpoint
    dict, matching the reference's renaming scheme (encoder.py:84-112)."""
    import numpy as np

    stage_sizes = {
        "resnet18": [2, 2, 2, 2], "resnet34": [3, 4, 6, 3],
        "resnet50": [3, 4, 6, 3], "resnet101": [3, 4, 23, 3],
        "resnet152": [3, 8, 36, 3],
    }[network_name]
    torch_sd = export_torch_resnet_state_dict(variables, stage_sizes)

    d2: dict = {}
    for name, param in torch_sd.items():
        for old, new in _DETECTRON2_RENAME.items():
            name = name.replace(old, new)
        if not name.startswith("res"):
            name = f"stem.{name}"
        d2[name] = np.asarray(param)
    return {
        "model": d2,
        "__author__": "clip_lite_tpu",
        "matching_heuristics": True,
    }
