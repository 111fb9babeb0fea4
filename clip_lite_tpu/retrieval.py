"""Image-text retrieval evaluation (COCO 5k / Flickr30k R@1/5/10).

Equivalent of the reference's retrieval.py (:66-279): encode every caption
and image with the frozen towers + the loss's projection heads, build the
similarity matrix, and report recalls in both directions.

Run:
    python -m clip_lite_tpu.retrieval \
        --config <downstream.yaml> --pretrain-config <pretrain.yaml> \
        --checkpoint-path <ckpt.msgpack>
where the downstream config's DATA.ROOT points at the COCO or Flickr30k
directory (DownstreamDatasetFactory keys on the trailing dir name).
"""

from __future__ import annotations

import json

import numpy as np

from clip_lite_tpu.config import Config
from clip_lite_tpu.eval_utils import EncoderBundle, itm_eval
from clip_lite_tpu.factories import DownstreamDatasetFactory, TokenizerFactory
from clip_lite_tpu.data.pipeline import DataLoader
from clip_lite_tpu.utils.common import (
    apply_platform_args,
    common_parser,
    common_setup,
)

parser = common_parser(description="COCO/Flickr image-text retrieval eval.")
parser.add_argument("--pretrain-config", required=True,
                    help="Pretraining config YAML of the checkpoint.")
parser.add_argument("--pretrain-config-override", nargs="*", default=[])
parser.add_argument("--checkpoint-path", required=True)
parser.add_argument("--split", default="val")
parser.add_argument("--batch-size", type=int, default=128)


def main(_A) -> None:
    apply_platform_args(_A)
    _C_down = Config(_A.config, list(_A.config_override))
    _C = Config(_A.pretrain_config, list(_A.pretrain_config_override))
    logger = common_setup(_C_down, _A, job_type="retrieval")

    dataset = DownstreamDatasetFactory.from_config(_C_down, split=_A.split)
    loader = DataLoader(dataset, _A.batch_size, shuffle=False,
                        drop_last=False, num_workers=_A.cpu_workers,
                        background=False)
    tokenizer = TokenizerFactory.from_config(_C)
    bundle = EncoderBundle(_C, _A.checkpoint_path,
                           batch_size=_A.batch_size)

    logger.info("Encoding %d captions...", len(dataset.text))
    text_embeds = bundle.encode_texts(dataset.text, tokenizer)
    logger.info("Encoding %d images...", len(dataset))
    image_embeds = bundle.encode_image_batches(iter(loader))

    sims = image_embeds @ text_embeds.T  # (reference: retrieval.py:143)
    result = itm_eval(sims, sims.T, dataset.txt2img, dataset.img2txt)
    logger.info("Retrieval: %s", {k: round(v, 2) for k, v in result.items()})
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main(parser.parse_args())
