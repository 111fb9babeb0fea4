"""Serialize raw COCO Captions into CLRec record files.

Equivalent of the reference's scripts/coco_preprocess.py (:78-142), which
writes LMDB of pickled (image_id, raw ndarray, captions).  Differences:
images are stored as JPEG bytes (10x smaller, decode overlaps device
compute), and the container is the mmap-friendly CLRec format
(data/readers.py).

Modes (reference :93-130):
  train_sbert / glove : store raw caption strings
  sbert               : additionally store precomputed caption embeddings
                        (requires a sentence-transformers model — gated,
                        offline environments use train_sbert/glove)

Usage:
    python -m clip_lite_tpu.scripts.coco_preprocess \
        --data-root datasets/coco --split train --mode train_sbert \
        --output-dir datasets/serialized [--short-edge 640]
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np

from clip_lite_tpu.data.readers import (
    ClRecWriter,
    CocoCaptionsDirReader,
    encode_image,
)

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--data-root", required=True)
parser.add_argument("--split", default="train", choices=["train", "val"])
parser.add_argument("--mode", default="train_sbert",
                    choices=["train_sbert", "glove", "sbert"])
parser.add_argument("--output-dir", required=True)
parser.add_argument("--short-edge", type=int, default=0,
                    help="Resize so the short edge is this (0 = keep).")
parser.add_argument("--jpeg-quality", type=int, default=95)
parser.add_argument("--sbert-model", default="all-mpnet-base-v2")


def maybe_resize(image: np.ndarray, short_edge: int) -> np.ndarray:
    if not short_edge:
        return image
    h, w = image.shape[:2]
    if min(h, w) <= short_edge:
        return image
    scale = short_edge / min(h, w)
    return cv2.resize(image, (int(round(w * scale)), int(round(h * scale))),
                      interpolation=cv2.INTER_AREA)


def main(args) -> str:
    reader = CocoCaptionsDirReader(args.data_root, args.split)
    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(
        args.output_dir, f"coco_{args.split}_{args.mode}2017.clrec")

    sbert = None
    if args.mode == "sbert":
        try:
            from sentence_transformers import SentenceTransformer

            sbert = SentenceTransformer(args.sbert_model)
        except ImportError as e:
            raise SystemExit(
                "mode=sbert needs sentence-transformers (not available "
                "offline); use train_sbert or glove") from e

    with ClRecWriter(out) as writer:
        for i in range(len(reader)):
            rec = reader[i]
            image = maybe_resize(rec["image"], args.short_edge)
            payload = {
                "image_id": rec["image_id"],
                "image": encode_image(image, args.jpeg_quality),
                "captions": rec["captions"],
            }
            if sbert is not None:
                payload["caption_encodings"] = np.asarray(
                    sbert.encode(rec["captions"]), np.float32)
            writer.append(payload)
            if (i + 1) % 5000 == 0:
                print(f"{i + 1}/{len(reader)} records")
    print(f"Wrote {len(reader)} records to {out}")
    return out


if __name__ == "__main__":
    main(parser.parse_args())
