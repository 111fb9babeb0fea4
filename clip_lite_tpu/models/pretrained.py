"""Pretrained-weight initialization from torch checkpoints.

The reference loads ImageNet towers from torchvision and text towers from
the HF hub at construction time (reference: encoder.py:36,163).  This
environment has no network, so pretrained initialization consumes LOCAL
torch checkpoint files instead:

  MODEL.VISUAL.PRETRAINED + MODEL.VISUAL.PRETRAINED_PATH
      torchvision-layout ResNet state_dict (.pt/.pth, torch.save format)
  MODEL.TEXTUAL.PRETRAINED + MODEL.TEXTUAL.PRETRAINED_PATH
      HF BertModel/MPNetModel state_dict

Conversion reuses the tested importers (models/resnet.py, models/bert.py,
models/mpnet.py).
"""

from __future__ import annotations

import logging
from typing import Any, Dict

logger = logging.getLogger("clip_lite_tpu")

_RESNET_STAGES = {
    "resnet18": [2, 2, 2, 2], "resnet34": [3, 4, 6, 3],
    "resnet50": [3, 4, 6, 3], "resnet101": [3, 4, 23, 3],
    "resnet152": [3, 8, 36, 3],
}


def _load_torch_state_dict(path: str) -> Dict[str, Any]:
    import numpy as np

    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in obj.items()}


def apply_pretrained_weights(variables: Dict[str, Any], config) -> Dict[str, Any]:
    """Splice pretrained tower weights into initialized model variables.

    variables: {"params", "batch_stats"} of the full VLInfoModel.
    Returns the updated variables (new dicts; inputs unmodified).
    """
    import jax

    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))

    vis = config.MODEL.VISUAL
    if vis.PRETRAINED and vis.get("PRETRAINED_PATH"):
        from clip_lite_tpu.models.resnet import import_torch_resnet_state_dict

        name = vis.NETWORK_NAME
        if name not in _RESNET_STAGES:
            raise ValueError(f"Pretrained loading supports ResNets, got {name!r}")
        sd = _load_torch_state_dict(vis.PRETRAINED_PATH)
        tower = import_torch_resnet_state_dict(sd, _RESNET_STAGES[name])
        params["image_encoder"] = {"backbone": tower["params"]}
        stats["image_encoder"] = {"backbone": tower["batch_stats"]}
        logger.info("Loaded pretrained visual tower from %s",
                    vis.PRETRAINED_PATH)

    txt = config.MODEL.TEXTUAL
    if txt.PRETRAINED and txt.get("PRETRAINED_PATH"):
        sd = _load_torch_state_dict(txt.PRETRAINED_PATH)
        if "mpnet" in txt.NETWORK_NAME:
            from clip_lite_tpu.models.mpnet import import_hf_mpnet_state_dict

            tower = import_hf_mpnet_state_dict(sd, txt.NUM_HIDDEN_LAYERS)
        else:
            from clip_lite_tpu.models.bert import import_hf_bert_state_dict

            tower = import_hf_bert_state_dict(sd, txt.NUM_HIDDEN_LAYERS)
        te = dict(params["text_encoder"])
        te["transformer"] = tower["params"]
        params["text_encoder"] = te
        logger.info("Loaded pretrained text tower from %s",
                    txt.PRETRAINED_PATH)

    return {"params": params, "batch_stats": stats}