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
parser.add_argument("--pretrain-config", default=None,
                    help="Pretraining config YAML of the checkpoint "
                         "(required with --weight-init vlinfo).")
parser.add_argument("--pretrain-config-override", nargs="*", default=[])
parser.add_argument("--checkpoint-path", required=True,
                    help="vlinfo: a framework checkpoint; clip: a local "
                         "HuggingFace CLIP model directory.")
parser.add_argument("--weight-init", default="vlinfo",
                    choices=["vlinfo", "clip"],
                    help="Score a framework checkpoint, or an OpenAI-CLIP "
                         "model for side-by-side comparison "
                         "(reference: retrieval.py:248-252).")
parser.add_argument("--split", default="val")
parser.add_argument("--batch-size", type=int, default=128)


class ClipComparisonBundle:
    """Score an OpenAI CLIP model through the same itm_eval tables
    (the reference's ``--weight-init clip`` path, retrieval.py:248-252).

    Package-gated: uses transformers' Flax CLIP (TPU-native — same XLA
    path as the framework's own towers) from a LOCAL pretrained
    directory; no network access is attempted.  Batches come from the
    same dataloader as the vlinfo path, mirroring the reference's
    comparison protocol (identical preprocessing for both models).
    """

    def __init__(self, model_path: str, batch_size: int = 128):
        try:
            from transformers import CLIPTokenizerFast, FlaxCLIPModel
        except Exception as e:  # pragma: no cover - env without flax-clip
            raise RuntimeError(
                "CLIP comparison needs transformers' FlaxCLIPModel") from e
        self.model = FlaxCLIPModel.from_pretrained(model_path,
                                                   local_files_only=True)
        self.tokenizer = CLIPTokenizerFast.from_pretrained(
            model_path, local_files_only=True)
        self.batch_size = batch_size

    @staticmethod
    def _l2(x):
        return x / np.clip(np.linalg.norm(x, axis=-1, keepdims=True),
                           1e-12, None)

    def encode_texts(self, texts, tokenizer=None) -> np.ndarray:
        out = []
        for i in range(0, len(texts), self.batch_size):
            enc = self.tokenizer(list(texts[i:i + self.batch_size]),
                                 padding="max_length", truncation=True,
                                 max_length=77, return_tensors="np")
            feats = self.model.get_text_features(
                input_ids=enc["input_ids"],
                attention_mask=enc["attention_mask"])
            out.append(np.asarray(feats))
        return self._l2(np.concatenate(out))

    def encode_image_batches(self, batches) -> np.ndarray:
        out = []
        for batch in batches:
            pixels = np.transpose(np.asarray(batch["image"], np.float32),
                                  (0, 3, 1, 2))  # NHWC -> CLIP's NCHW
            feats = self.model.get_image_features(pixel_values=pixels)
            out.append(np.asarray(feats))
        return self._l2(np.concatenate(out))


def main(_A) -> None:
    apply_platform_args(_A)
    _C_down = Config(_A.config, list(_A.config_override))
    logger = common_setup(_C_down, _A, job_type="retrieval")

    dataset = DownstreamDatasetFactory.from_config(_C_down, split=_A.split)
    loader = DataLoader(dataset, _A.batch_size, shuffle=False,
                        drop_last=False, num_workers=_A.cpu_workers,
                        background=False)
    if _A.weight_init == "clip":
        tokenizer = None
        bundle = ClipComparisonBundle(_A.checkpoint_path,
                                      batch_size=_A.batch_size)
    else:
        if not _A.pretrain_config:
            parser.error("--pretrain-config is required for vlinfo")
        _C = Config(_A.pretrain_config, list(_A.pretrain_config_override))
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
