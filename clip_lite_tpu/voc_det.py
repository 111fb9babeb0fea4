"""Detection-eval interop: export a trained tower for Detectron2.

The reference fine-tunes the backbone inside Detectron2 on VOC detection
(reference: voc_det.py:81-175) — a CUDA-only stack that is out of scope
for the TPU core (SURVEY.md section 2.3).  The interop surface it depends
on is the weight export (reference: encoder.py:67-112), fully supported
here: this driver converts a pretraining checkpoint into a
Detectron2-loadable ``.pkl`` with the D2 naming convention
(stem/res2..res5, conv.norm, shortcut), so detection evals run unchanged
on a GPU machine with Detectron2 installed.

Run:
    python -m clip_lite_tpu.voc_det --pretrain-config <yaml> \
        --checkpoint-path ckpt.msgpack --output backbone_d2.pkl
"""

from __future__ import annotations

import pickle

from clip_lite_tpu.config import Config
from clip_lite_tpu.models.image_encoder import detectron2_backbone_state_dict
from clip_lite_tpu.utils.checkpointing import load_model_variables
from clip_lite_tpu.utils.common import (
    apply_platform_args,
    common_parser,
    common_setup,
)

parser = common_parser(description="Export backbone for Detectron2.")
parser.add_argument("--pretrain-config", required=True)
parser.add_argument("--pretrain-config-override", nargs="*", default=[])
parser.add_argument("--checkpoint-path", required=True)
parser.add_argument("--output", required=True, help="Output .pkl path.")


def main(_A) -> str:
    apply_platform_args(_A)
    _C = Config(_A.pretrain_config, list(_A.pretrain_config_override))
    logger = common_setup(_C, _A, job_type="voc_det_export")

    variables = load_model_variables(_A.checkpoint_path)
    tower = {
        "params": variables["params"]["image_encoder"]["backbone"],
        "batch_stats": variables["batch_stats"]["image_encoder"]["backbone"],
    }
    d2 = detectron2_backbone_state_dict(tower, _C.MODEL.VISUAL.NETWORK_NAME)
    with open(_A.output, "wb") as f:
        pickle.dump(d2, f)
    logger.info("Exported %d tensors (%s) -> %s",
                len(d2["model"]), _C.MODEL.VISUAL.NETWORK_NAME, _A.output)
    return _A.output


if __name__ == "__main__":
    main(parser.parse_args())
