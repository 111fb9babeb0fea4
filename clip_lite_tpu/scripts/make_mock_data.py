"""Generate a mock caption corpus for zero-dependency smoke runs.

Equivalent of the reference's ``data/mock_data.json`` fixture (42
conceptual-captions-style records exercising JsonDataset, SURVEY §2 item
31) — but self-contained: also writes the referenced JPEG images, so the
json pipeline runs end-to-end on a fresh machine.

Usage:
    python -m clip_lite_tpu.scripts.make_mock_data --output-dir /tmp/mock
    python -m clip_lite_tpu.train --config-override MODEL.NAME json \
        DATA.JSON_FILES_TRAIN "['/tmp/mock/mock_data.json']" ...
"""

from __future__ import annotations

import argparse
import json
import os

import cv2
import numpy as np

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--output-dir", required=True)
parser.add_argument("--num-records", type=int, default=42)
parser.add_argument("--image-size", type=int, default=96)

_SUBJECTS = ["a dog", "a red truck", "two people", "a surfer", "a kitchen",
             "a plate of food", "a street sign", "a small boat"]
_SETTINGS = ["on the beach", "in the park", "at night", "near a building",
             "under a blue sky", "on a city street", "by the river"]


def main(args) -> str:
    img_dir = os.path.join(args.output_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    records = []
    for i in range(args.num_records):
        img = np.zeros((args.image_size, args.image_size, 3), np.uint8)
        img[:] = rng.randint(0, 256, 3)
        cv2.circle(img, (args.image_size // 2, args.image_size // 2),
                   args.image_size // 4,
                   tuple(int(c) for c in rng.randint(0, 256, 3)), -1)
        path = os.path.join(img_dir, f"{i:05d}.jpg")
        cv2.imwrite(path, img)
        captions = [
            f"{_SUBJECTS[i % len(_SUBJECTS)]} "
            f"{_SETTINGS[(i + j) % len(_SETTINGS)]}"
            for j in range(2)
        ]
        records.append({"image": path, "caption": captions})
    out = os.path.join(args.output_dir, "mock_data.json")
    with open(out, "w") as f:
        json.dump(records, f, indent=1)
    print(f"{len(records)} mock records -> {out}")
    return out


if __name__ == "__main__":
    main(parser.parse_args())
