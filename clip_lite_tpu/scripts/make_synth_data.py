"""Generate a synthetic LEARNABLE caption corpus in exact COCO layout.

Unlike make_mock_data.py (a 42-record pipeline smoke fixture), this
produces a corpus whose captions genuinely describe image content —
colored geometric shapes with varying position / size / background —
so a model trained on it must learn real vision-language grounding, and
held-out retrieval / zero-shot accuracy measures that learning (the
in-environment substitute for BASELINE.md's trained-checkpoint quality
row; reference metrics: retrieval.py:152-209, zero_shot.py:60-167).

Emits the exact directory layouts the existing tooling consumes, so the
full production pipeline runs unmodified:

  <out>/coco/images/{train,val}2017/*.jpg      CocoCaptionsDirReader
  <out>/coco/{train,val}2017 -> images/...     (symlink) ReEvalDataset
  <out>/coco/annotations/captions_*2017.json   both of the above
  <out>/imagenet/{train,val}/<color>_<shape>/  ImageNetDataset
                                               (zero-shot + linear probe)
  <out>/VOC2007/JPEGImages + ImageSets/Main    VOC07ClassificationDataset
                                               (SVM mAP; 16 multi-label
                                               classes = 8 colors + 8
                                               shapes; the background
                                               color is marked VOC
                                               "difficult" -> ignored)
  <out>/coco_gender/images + gender_annotations/{split}.pkl
                                               CocoObjectGender (bias_eda;
                                               the protected attribute is
                                               shape COLOR: red ≙ "man",
                                               blue ≙ "woman")

Pipeline:
    python -m clip_lite_tpu.scripts.make_synth_data --output-dir /tmp/synth
    python -m clip_lite_tpu.scripts.coco_preprocess \
        --data-root /tmp/synth/coco --split train --mode train_sbert \
        --output-dir /tmp/synth/serialized --short-edge 256
    python -m clip_lite_tpu.train --config configs/fs_tpu_tuned.yaml ...
    python -m clip_lite_tpu.retrieval  ... (DATA.ROOT /tmp/synth/coco)
    python -m clip_lite_tpu.zero_shot  ... (DATA.ROOT /tmp/synth/imagenet)

Every image shows ONE shape in ONE color; captions always name both and
usually the position / size / background color, drawn from varied
templates.  (color, shape, position, size, background) has 9216 distinct
combinations, so val captions are near-unique and retrieval granularity
is per-image, not per-class.
"""

from __future__ import annotations

import argparse
import json
import os

import cv2
import numpy as np

parser = argparse.ArgumentParser(
    description="Synthetic learnable caption corpus (COCO layout).")
parser.add_argument("--output-dir", required=True)
parser.add_argument("--train-n", type=int, default=4000)
parser.add_argument("--val-n", type=int, default=500)
parser.add_argument("--zeroshot-per-class", type=int, default=8)
parser.add_argument("--probe-train-per-class", type=int, default=12,
                    help="imagenet/train images per class (linear probe).")
parser.add_argument("--voc-trainval", type=int, default=320)
parser.add_argument("--voc-test", type=int, default=160)
parser.add_argument("--gender-n", type=int, default=240,
                    help="coco_gender val images (red/blue populations).")
parser.add_argument("--image-size", type=int, default=256)
parser.add_argument("--seed", type=int, default=0)

# RGB; names appear verbatim in captions and class names.
COLORS = {
    "red": (220, 40, 40), "green": (40, 180, 60), "blue": (40, 80, 220),
    "yellow": (235, 220, 50), "purple": (160, 60, 200),
    "orange": (240, 140, 30), "cyan": (60, 210, 220),
    "white": (245, 245, 245),
}
SHAPES = ("circle", "square", "triangle", "ring", "cross", "diamond",
          "star", "stripe")
POSITIONS = ("top left", "top", "top right", "left", "center", "right",
             "bottom left", "bottom", "bottom right")
SIZES = ("small", "large")

_TEMPLATES = (
    "a {size} {color} {shape} in the {pos} on a {bg} background",
    "a photo of a {color} {shape} in the {pos} of the frame",
    "a {size} {color} {shape} over a {bg} backdrop",
    "there is a {color} {shape} near the {pos}",
    "a picture showing a {size} {color} {shape} on {bg}",
    "the {pos} of the image has a {color} {shape}",
)


def _draw_shape(img: np.ndarray, shape: str, color, cx: int, cy: int,
                r: int) -> None:
    c = tuple(int(v) for v in color)
    if shape == "circle":
        cv2.circle(img, (cx, cy), r, c, -1)
    elif shape == "ring":
        cv2.circle(img, (cx, cy), r, c, max(2, r // 3))
    elif shape == "square":
        cv2.rectangle(img, (cx - r, cy - r), (cx + r, cy + r), c, -1)
    elif shape == "diamond":
        pts = np.array([[cx, cy - r], [cx + r, cy], [cx, cy + r],
                        [cx - r, cy]])
        cv2.fillPoly(img, [pts], c)
    elif shape == "triangle":
        pts = np.array([[cx, cy - r], [cx + r, cy + r], [cx - r, cy + r]])
        cv2.fillPoly(img, [pts], c)
    elif shape == "cross":
        w = max(2, r // 3)
        cv2.rectangle(img, (cx - r, cy - w), (cx + r, cy + w), c, -1)
        cv2.rectangle(img, (cx - w, cy - r), (cx + w, cy + r), c, -1)
    elif shape == "star":
        ang = np.arange(10) * np.pi / 5 - np.pi / 2
        rad = np.where(np.arange(10) % 2 == 0, r, r * 0.45)
        pts = np.stack([cx + rad * np.cos(ang),
                        cy + rad * np.sin(ang)], 1).astype(np.int32)
        cv2.fillPoly(img, [pts], c)
    elif shape == "stripe":
        w = max(3, r // 2)
        cv2.rectangle(img, (cx - r, cy - w), (cx + r, cy + w), c, -1)
    else:  # pragma: no cover - guarded by SHAPES
        raise KeyError(shape)


def render(rng: np.random.RandomState, size: int, color_name: str,
           shape: str, pos_idx: int, size_name: str, bg_name: str
           ) -> tuple:
    """One (color, shape, position, size, background) scene, with noise
    and brightness jitter so the mapping is not pixel-trivial.
    Returns ``(image, box)`` where box is the shape's (x0, y0, x1, y1)."""
    bg = np.asarray(COLORS[bg_name], np.float32) * rng.uniform(0.25, 0.55)
    img = np.tile(bg.astype(np.uint8), (size, size, 1)).astype(np.uint8)
    noise = rng.normal(0, 12, img.shape)
    img = np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)

    row, col = divmod(pos_idx, 3)
    cell = size // 3
    cx = int(col * cell + cell // 2 + rng.randint(-cell // 6, cell // 6 + 1))
    cy = int(row * cell + cell // 2 + rng.randint(-cell // 6, cell // 6 + 1))
    r = (rng.randint(size // 14, size // 9) if size_name == "small"
         else rng.randint(size // 6, size // 4))
    color = np.asarray(COLORS[color_name], np.float32) * rng.uniform(.8, 1.)
    _draw_shape(img, shape, color, cx, cy, r)
    box = [max(0, cx - r), max(0, cy - r),
           min(size - 1, cx + r), min(size - 1, cy + r)]
    return img, box


def _captions(rng: np.random.RandomState, color: str, shape: str,
              pos: str, size_name: str, bg: str, n: int = 2) -> list:
    picks = rng.choice(len(_TEMPLATES), size=n, replace=False)
    return [_TEMPLATES[t].format(color=color, shape=shape, pos=pos,
                                 size=size_name, bg=bg) for t in picks]


def _sample_scene(rng: np.random.RandomState):
    color = list(COLORS)[rng.randint(len(COLORS))]
    shape = SHAPES[rng.randint(len(SHAPES))]
    pos_idx = rng.randint(9)
    size_name = SIZES[rng.randint(2)]
    bg_choices = [c for c in COLORS if c != color]
    bg = bg_choices[rng.randint(len(bg_choices))]
    return color, shape, pos_idx, size_name, bg


def _write_split(root: str, split: str, n: int, size: int,
                 rng: np.random.RandomState) -> None:
    img_dir = os.path.join(root, "images", f"{split}2017")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    # ReEvalDataset looks for <root>/{split}2017 (no images/ prefix);
    # CocoCaptionsDirReader for <root>/images/{split}2017 — link them.
    link = os.path.join(root, f"{split}2017")
    if not os.path.exists(link):
        os.symlink(os.path.join("images", f"{split}2017"), link)

    images, annotations = [], []
    ann_id = 1
    for i in range(n):
        color, shape, pos_idx, size_name, bg = _sample_scene(rng)
        img, _ = render(rng, size, color, shape, pos_idx, size_name, bg)
        fname = f"{i:012d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fname),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        images.append({"id": i, "file_name": fname,
                       "height": size, "width": size})
        for cap in _captions(rng, color, shape, POSITIONS[pos_idx],
                             size_name, bg):
            annotations.append(
                {"id": ann_id, "image_id": i, "caption": cap})
            ann_id += 1
    with open(os.path.join(root, "annotations",
                           f"captions_{split}2017.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    print(f"{split}: {n} images, {len(annotations)} captions")


def _write_imagenet(root: str, split: str, per_class: int, size: int,
                    rng: np.random.RandomState) -> None:
    """Directory-per-class split over all 64 (color, shape) classes —
    val feeds zero_shot.py, train+val feed linear_clf.py."""
    for color in COLORS:
        for shape in SHAPES:
            d = os.path.join(root, split, f"{color}_{shape}")
            os.makedirs(d, exist_ok=True)
            for j in range(per_class):
                pos_idx = rng.randint(9)
                size_name = SIZES[rng.randint(2)]
                bg = [c for c in COLORS if c != color][
                    rng.randint(len(COLORS) - 1)]
                img, _ = render(rng, size, color, shape, pos_idx,
                                size_name, bg)
                cv2.imwrite(os.path.join(d, f"{j:05d}.jpg"),
                            cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                            [cv2.IMWRITE_JPEG_QUALITY, 95])
    n_cls = len(COLORS) * len(SHAPES)
    print(f"imagenet/{split}: {n_cls} classes x {per_class} images")


def _write_voc(root: str, split: str, n: int, size: int,
               rng: np.random.RandomState) -> None:
    """VOC2007 layout for the SVM eval: 16 multi-label classes (8 colors
    + 8 shapes).  Each image is positive for its shape's color and shape
    class; its BACKGROUND color is written as VOC raw 0 ("difficult") —
    the reader maps that to ignore, exercising the same -1 path real
    VOC07 does (data/datasets.py:534-541)."""
    img_dir = os.path.join(root, "JPEGImages")
    set_dir = os.path.join(root, "ImageSets", "Main")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(set_dir, exist_ok=True)
    classes = list(COLORS) + list(SHAPES)
    lines = {c: [] for c in classes}
    for i in range(n):
        color, shape, pos_idx, size_name, bg = _sample_scene(rng)
        img, _ = render(rng, size, color, shape, pos_idx, size_name, bg)
        name = f"{split}_{i:06d}"
        cv2.imwrite(os.path.join(img_dir, f"{name}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        for c in classes:
            raw = 1 if c in (color, shape) else 0 if c == bg else -1
            lines[c].append(f"{name} {raw}")
    for c in classes:
        with open(os.path.join(set_dir, f"{c}_{split}.txt"), "w") as f:
            f.write("\n".join(lines[c]) + "\n")
    print(f"VOC2007/{split}: {n} images, {len(classes)} classes")


def _write_gender(root: str, split: str, n: int, size: int,
                  rng: np.random.RandomState) -> None:
    """coco_gender layout for bias_eda: the protected attribute is shape
    COLOR — red scenes are the "man" population, blue the "woman" one.
    Definitional prompt pairs for the direction are then color pairs
    (e.g. "a photo of a blue circle" / "a photo of a red circle"), and
    the debiasing math runs unchanged (utils/we.py)."""
    import pickle

    img_dir = os.path.join(root, "images")
    ann_dir = os.path.join(root, "gender_annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    ann = []
    for i in range(n):
        color = "red" if i % 2 == 0 else "blue"
        _, shape, pos_idx, size_name, _ = _sample_scene(rng)
        bg = [c for c in COLORS if c != color][rng.randint(len(COLORS) - 1)]
        img, box = render(rng, size, color, shape, pos_idx, size_name, bg)
        fname = f"images/{i:06d}.jpg"
        cv2.imwrite(os.path.join(root, fname),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        ann.append({"image_id": i, "filename": fname,
                    "gender": "man" if color == "red" else "woman",
                    "boxes": [box]})
    with open(os.path.join(ann_dir, f"{split}.pkl"), "wb") as f:
        pickle.dump(ann, f)
    print(f"coco_gender/{split}: {n} images ({n // 2} per population)")


def main(args) -> str:
    rng = np.random.RandomState(args.seed)
    coco_root = os.path.join(args.output_dir, "coco")
    if args.train_n:  # 0 = leave an existing corpus untouched
        _write_split(coco_root, "train", args.train_n, args.image_size, rng)
    if args.val_n:
        _write_split(coco_root, "val", args.val_n, args.image_size, rng)
    imnet = os.path.join(args.output_dir, "imagenet")
    if args.zeroshot_per_class:
        _write_imagenet(imnet, "val", args.zeroshot_per_class,
                        args.image_size, rng)
    if args.probe_train_per_class:
        _write_imagenet(imnet, "train", args.probe_train_per_class,
                        args.image_size, rng)
    voc = os.path.join(args.output_dir, "VOC2007")
    if args.voc_trainval:
        _write_voc(voc, "trainval", args.voc_trainval, args.image_size, rng)
    if args.voc_test:
        _write_voc(voc, "test", args.voc_test, args.image_size, rng)
    if args.gender_n:
        _write_gender(os.path.join(args.output_dir, "coco_gender"), "val",
                      args.gender_n, args.image_size, rng)
    return coco_root


if __name__ == "__main__":
    main(parser.parse_args())
