"""Datasets: pretraining + downstream, all emitting fixed-shape NHWC batches.

From-scratch equivalents of the reference's data/dataloader.py (10 dataset
classes, :36-1503).  TPU-first deviations, applied uniformly:

  * images stay NHWC (XLA's native layout) — no CHW transpose;
  * captions are padded to ``max_caption_length`` at collate time, so the
    compiled step sees ONE static shape (the reference pads dynamically per
    batch, dataloader.py:453-462 — a recompile per length on TPU);
  * randomness is an explicit per-(seed, epoch, index) Generator, not
    process-global ``random`` — workers are reproducible and order-free;
  * datasets return plain numpy; device placement happens in the loader.
"""

from __future__ import annotations

import glob
import json
import os
import pickle
from collections import defaultdict
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from clip_lite_tpu.data import transforms as T
from clip_lite_tpu.data.readers import (
    CocoCaptionsRecordReader,
    decode_image,
)
from clip_lite_tpu.data.tokenizers import GloveTokenizer, get_hf_tokenizer


def _imread_rgb(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _pad_tokens(ids: List[int], length: int, pad: int) -> np.ndarray:
    out = np.full((length,), pad, np.int32)
    ids = ids[:length]
    out[: len(ids)] = ids
    return out


class Dataset:
    """Minimal dataset protocol: __len__, __getitem__(idx) -> dict, and a
    ``collate_fn`` producing fixed-shape numpy batches."""

    seed: int = 0
    epoch: int = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _rng(self, idx: int) -> np.random.Generator:
        return np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, idx]))

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        raise NotImplementedError


class CaptionDatasetBase(Dataset):
    """Shared caption-pair preparation for the pretraining datasets
    (the common core of reference dataloader.py:239-491)."""

    def __init__(self, mode: str = "train_sbert",
                 image_transform: Optional[Callable] = None,
                 max_caption_length: int = 30,
                 use_single_caption: bool = False,
                 tokenizer_name: str = "bert-base-uncased",
                 visual_self_supervised: bool = False,
                 textual_self_supervised: bool = False,
                 word_dict_path: Optional[str] = None,
                 vocab_size: Optional[int] = None,
                 seq_buckets: Optional[Sequence[int]] = None):
        self.mode = mode
        self.image_transform = image_transform or T.DEFAULT_IMAGE_TRANSFORM
        self.max_caption_length = max_caption_length
        self.use_single_caption = use_single_caption
        # Sequence-length bucketing (DATA.SEQ_BUCKETS): collate trims the
        # caption tensors to the smallest bucket >= the batch's longest
        # real caption; the top bucket is always max_caption_length.
        buckets = sorted(int(b) for b in (seq_buckets or []))
        if buckets:
            if buckets[-1] > max_caption_length:
                raise ValueError(
                    f"SEQ_BUCKETS {buckets} exceed MAX_CAPTION_LENGTH "
                    f"{max_caption_length}")
            if buckets[-1] != max_caption_length:
                buckets.append(max_caption_length)
        self.seq_buckets = tuple(buckets)
        self.visual_self_supervised = visual_self_supervised
        self.textual_self_supervised = textual_self_supervised
        self.caption_transform = T.Compose(
            [T.NormalizeCaption(max_caption_length)])

        if mode == "glove":
            if word_dict_path and os.path.exists(word_dict_path):
                self.tokenizer = GloveTokenizer(word_dict_path)
            else:
                self.tokenizer = GloveTokenizer(
                    word_dict={w: i for i, w in enumerate(
                        ["<pad>", "<start>", "<eos>", "<unk>"])})
            self.padding_idx = self.tokenizer.token_to_id("<pad>")
            self.glove_pipeline = T.Compose([
                T.NormalizeCaption(max_caption_length),
                T.TokenizeCaption(self.tokenizer),
                T.TruncateCaptionTokens(max_caption_length),
            ])
        elif mode in ("train_sbert", "sbert"):
            self.tokenizer = get_hf_tokenizer(
                tokenizer_name, max_length=max_caption_length,
                vocab_size=vocab_size)
            self.padding_idx = getattr(self.tokenizer, "pad_token_id", 0)
        else:
            raise ValueError(f"Unknown dataset mode {mode!r}")

    def _tokenize(self, caption: str) -> Tuple[np.ndarray, np.ndarray]:
        enc = self.tokenizer(caption, padding="max_length", truncation=True,
                             max_length=self.max_caption_length)
        ids = np.asarray(enc["input_ids"], np.int32)
        mask = np.asarray(enc["attention_mask"], np.int32)
        return ids, mask

    def _prepare(self, image_id: int, image: np.ndarray, captions,
                 rng: np.random.Generator) -> Dict[str, Any]:
        if isinstance(captions, (list, tuple)):
            if self.use_single_caption or len(captions) == 1:
                caption = captions[0]
            else:
                caption = captions[int(rng.integers(len(captions)))]
        else:
            caption = captions  # sbert mode: precomputed vector

        aug_image_src = image
        aug_caption = caption
        if (self.textual_self_supervised and isinstance(captions, list)
                and len(captions) > 1):
            while aug_caption == caption:
                aug_caption = captions[int(rng.integers(len(captions)))]

        out = self.image_transform(image=image, caption=caption, rng=rng)
        image_t, caption = out["image"], out.get("caption", caption)

        item: Dict[str, Any] = {
            "image_id": np.int64(image_id),
            "image": np.asarray(image_t, np.float32),
        }

        if self.mode == "glove":
            tokens = self.glove_pipeline(caption=caption, rng=rng)["caption"]
            item["caption_tokens"] = _pad_tokens(
                tokens, self.max_caption_length, self.padding_idx)
            item["noitpac_tokens"] = _pad_tokens(
                tokens[::-1], self.max_caption_length, self.padding_idx)
            item["caption_lengths"] = np.int64(len(tokens))
        elif self.mode == "sbert":
            item["caption_encodings"] = np.asarray(caption, np.float32)
        else:  # train_sbert
            caption = self.caption_transform(caption=caption, rng=rng)["caption"]
            item["input_ids"], item["attention_mask"] = self._tokenize(caption)
            if self.textual_self_supervised:
                aug_c = self.caption_transform(
                    caption=aug_caption, rng=rng)["caption"]
                item["aug_input_ids"], item["aug_attention_mask"] = \
                    self._tokenize(aug_c)
            if self.visual_self_supervised:
                aug_out = self.image_transform(
                    image=aug_image_src, caption=aug_caption, rng=rng)
                item["aug_image"] = np.asarray(aug_out["image"], np.float32)
        return item

    def collate_fn(self, items: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        return {k: np.stack([d[k] for d in items]) for k in items[0]}

    _CAPTION_BATCH_KEYS = ("input_ids", "attention_mask",
                           "aug_input_ids", "aug_attention_mask",
                           "neg_input_ids", "neg_attention_mask")

    def trim_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Trim the caption tensors of a collated batch to the smallest
        configured bucket that holds the batch's longest real caption.

        Exactness: padding positions carry attention_mask=0, so every
        real-token output of the text tower is unchanged by the trim (the
        masked-softmax/pooling tests pin this); only the compiled shape
        changes.  No-op when SEQ_BUCKETS is empty or in non-token modes."""
        if not self.seq_buckets or "attention_mask" not in batch:
            return batch
        longest = int(np.max(np.sum(batch["attention_mask"], axis=1)))
        for mk in ("aug_attention_mask", "neg_attention_mask"):
            if mk in batch:
                longest = max(longest, int(np.max(
                    np.sum(batch[mk], axis=1))))
        width = next(b for b in self.seq_buckets if b >= longest)
        if width >= batch["attention_mask"].shape[1]:
            return batch
        for k in self._CAPTION_BATCH_KEYS:
            if k in batch:
                batch[k] = np.ascontiguousarray(batch[k][:, :width])
        return batch

    def _caption_token_length(self, caption: str) -> int:
        enc = self.tokenizer(caption, padding="max_length", truncation=True,
                             max_length=self.max_caption_length)
        return int(np.sum(enc["attention_mask"]))

    def caption_max_token_lengths(self) -> Optional[np.ndarray]:
        """Per-item upper bound on tokenized caption length (max over the
        item's candidate captions, since the caption choice is random per
        epoch).  Returns None where a cheap scan isn't available; used by
        the loader's length-grouped shuffling."""
        return None


class RandomDataset(CaptionDatasetBase):
    """Synthetic smoke dataset — random images + canned captions
    (reference: data/dataloader.py:36-114, registered as name "random").
    Runs the full pipeline with zero data dependencies."""

    CAPTIONS = [
        "a man riding a wave on top of a surfboard",
        "a kitchen with a stove and a refrigerator",
        "two dogs playing with a red ball in the park",
        "a group of people standing around a food truck",
    ]

    def __init__(self, data_root: str = "", split: str = "train",
                 length: int = 118000, image_size: int = 224, **kw):
        kw.pop("percentage", None)
        super().__init__(**kw)
        self.length = length if split == "train" else max(64, length // 100)
        self.image_size = image_size

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int):
        rng = self._rng(idx)
        image = rng.integers(0, 256, (self.image_size, self.image_size, 3),
                             dtype=np.uint8)
        captions = list(self.CAPTIONS)
        if self.mode == "sbert":
            captions = rng.normal(size=(768,)).astype(np.float32)
        return self._prepare(idx, image, captions, rng)

    def caption_max_token_lengths(self) -> Optional[np.ndarray]:
        if self.mode != "train_sbert":
            return None
        # Each item draws from the same caption pool: one shared bound.
        bound = max(self._caption_token_length(c) for c in self.CAPTIONS)
        return np.full(self.length, bound, np.int32)


class JsonDataset(CaptionDatasetBase):
    """ALBEF-style json caption files: [{"image": path, "caption": str|list}]
    (reference: data/dataloader.py:117-236)."""

    def __init__(self, json_files: List[str], data_root: str = "",
                 split: str = "train", percentage: float = 100.0, **kw):
        super().__init__(**kw)
        self.ann: List[dict] = []
        for f in json_files:
            with open(f) as fh:
                self.ann += json.load(fh)
        rng = np.random.default_rng(0)
        rng.shuffle(self.ann)
        if percentage < 100.0:
            drop = int((100.0 - percentage) / 100.0 * len(self.ann))
            self.ann = self.ann[drop:]

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, idx: int):
        rng = self._rng(idx)
        ann = self.ann[idx]
        image = _imread_rgb(ann["image"])
        captions = ann["caption"]
        if not isinstance(captions, list):
            captions = [captions]
        return self._prepare(idx, image, captions, rng)

    def caption_max_token_lengths(self) -> Optional[np.ndarray]:
        if self.mode != "train_sbert":
            return None
        out = np.empty(len(self.ann), np.int32)
        for i, ann in enumerate(self.ann):
            caps = ann["caption"]
            caps = caps if isinstance(caps, list) else [caps]
            out[i] = max(self._caption_token_length(c) for c in caps)
        return out


class CocoCaptionsDataset(CaptionDatasetBase):
    """Main pretraining dataset over a CLRec-serialized COCO split
    (reference: data/dataloader.py:239-491 over LMDB).

    With ``native_pipeline=True`` (config DATA.NATIVE_PIPELINE) batches
    take the TPU-first fast path: the C++ core fuses JPEG decode + random
    resized crop + flip into a uint8 batch (data/native.py), which ships
    over PCIe at 1/4 the bytes, and the compiled step finishes
    augmentation on device (engine._maybe_device_preprocess).  Host-side
    color jitter / caption-aware flip word swap are not part of this path
    (flip + full brightness/contrast/saturation/hue jitter happen on
    device, ops/image_ops.py — matching the host ColorJitter's laws).
    """

    def __init__(self, data_root: str, split: str = "train",
                 percentage: float = 100.0, native_pipeline: bool = False,
                 crop_size: int = 224, **kw):
        super().__init__(**kw)
        path = os.path.join(data_root, f"coco_{split}_{kw.get('mode', self.mode)}2017.clrec")
        self.reader = CocoCaptionsRecordReader(path, percentage=percentage)
        self.split = split
        self.crop_size = crop_size
        self.native_pipeline = False
        if native_pipeline:
            from clip_lite_tpu.data import native

            if native.native_available():
                self.native_reader = native.NativeClRecReader(path)
                self.native_pipeline = True
            else:
                import logging

                logging.getLogger("clip_lite_tpu").warning(
                    "DATA.NATIVE_PIPELINE requested but native library not "
                    "built (make -C native); using the Python path.")

    def load_batch(self, indices) -> Dict[str, np.ndarray]:
        """Batch fast path: fused native decode/crop/flip -> uint8 images
        + tokenized captions.  Only called when native_pipeline is on."""
        from clip_lite_tpu.data import native

        rng = self._rng(int(indices[0]) + 1_000_003 * self.epoch)
        recs = [self.native_reader[int(self.reader._indices[i])]
                for i in indices]
        jpegs = [r["image"] for r in recs]
        n = len(recs)
        if self.split == "train":
            boxes = native.random_resized_crop_boxes(rng, n)
        else:
            boxes = np.full((n, 4), -1.0, np.float32)  # full resize
        # Flip happens on device (engine); keep host tiles unflipped.
        flips = np.zeros(n, np.uint8)
        images, failures = native.decode_crop_batch(
            jpegs, self.crop_size, boxes, flips,
            num_threads=max(1, os.cpu_count() or 1))

        ids_list, mask_list, image_ids = [], [], []
        for rec in recs:
            captions = rec["captions"]
            cap = captions[0] if self.use_single_caption else \
                captions[int(rng.integers(len(captions)))]
            cap = self.caption_transform(caption=cap, rng=rng)["caption"]
            ids, mask = self._tokenize(cap)
            ids_list.append(ids)
            mask_list.append(mask)
            image_ids.append(rec["image_id"])
        return {
            "image_id": np.asarray(image_ids, np.int64),
            "image": images,  # uint8; device finishes preprocessing
            "input_ids": np.stack(ids_list),
            "attention_mask": np.stack(mask_list),
        }

    def __len__(self):
        return len(self.reader)

    def __getitem__(self, idx: int):
        rng = self._rng(idx)
        rec = self.reader[idx]
        captions = rec.get("caption_encodings") if self.mode == "sbert" else None
        if captions is None:
            captions = rec["captions"]
            if self.mode == "sbert":
                raise ValueError(
                    "sbert mode needs records with precomputed "
                    "'caption_encodings' (run scripts/coco_preprocess.py "
                    "--mode sbert)")
        elif self.mode == "sbert" and isinstance(captions, np.ndarray) \
                and captions.ndim == 2:
            captions = captions[int(rng.integers(len(captions)))]
        return self._prepare(rec["image_id"], rec["image"], captions, rng)

    def caption_max_token_lengths(self) -> Optional[np.ndarray]:
        if self.mode != "train_sbert":
            return None
        # One record read per item WITHOUT JPEG decode (readers.captions).
        out = np.empty(len(self.reader), np.int32)
        for i in range(len(self.reader)):
            out[i] = max(self._caption_token_length(c)
                         for c in self.reader.captions(i))
        return out


class CocoCaptionsClusteredDataset(CaptionDatasetBase):
    """Curriculum hard negatives from caption k-means clusters
    (reference: data/dataloader.py:494-797): the number of clusters shrinks
    linearly over training; each item pairs a positive with a random other
    image from the SAME cluster (a hard negative).

    The loader calls ``set_iteration`` each step (host-side data state —
    the compiled step never sees it; SURVEY.md hard part #6)."""

    def __init__(self, data_root: str, split: str = "train",
                 negative_sampling: str = "clusters", total_iters: int = 500000,
                 negative_sampling_start_iter: int = 250000,
                 cluster_path: str = "", coco_root: str = "",
                 percentage: float = 100.0, **kw):
        kw.pop("visual_self_supervised", None)
        kw.pop("textual_self_supervised", None)
        super().__init__(**kw)
        path = os.path.join(data_root, f"coco_{split}_{self.mode}2017.clrec")
        self.reader = CocoCaptionsRecordReader(path, percentage=percentage)
        self.split = split
        self.cluster_path = cluster_path
        self.coco_root = coco_root
        self.total_iters = total_iters
        self.negative_sampling_start_iter = negative_sampling_start_iter
        self.iter_num = 0
        self.current_cluster_num = -1
        self.cluster_options = self._scan_cluster_options()
        self._img_id_cluster_map: Dict[int, int] = {}
        self._cluster_img_ids: Dict[int, List[int]] = {}
        self._img_id_caption_map: Optional[dict] = None
        self._img_id_filename_map: Optional[dict] = None

    def _scan_cluster_options(self) -> List[int]:
        options = []
        for f in os.listdir(self.cluster_path):
            if f"img_id_cluster_map_{self.split}" in f:
                options.append(int(f.split("_")[-1].replace(".pkl", "")))
        if not options:
            raise FileNotFoundError(
                f"No img_id_cluster_map_{self.split}_*.pkl under "
                f"{self.cluster_path} (run scripts/cluster.py first)")
        return sorted(options)

    def set_iteration(self, iteration: int) -> None:
        self.iter_num = iteration

    # Reference alias (dataloader.py:588).
    update_iter = set_iteration

    def _maybe_reload_clusters(self) -> None:
        span = self.total_iters - self.negative_sampling_start_iter
        frac = (self.iter_num - self.negative_sampling_start_iter) / max(1, span)
        pred = max(self.cluster_options) * frac
        num = min(self.cluster_options, key=lambda x: abs(x - pred))
        if num != self.current_cluster_num:
            if self._img_id_caption_map is None:
                with open(os.path.join(
                        self.cluster_path,
                        f"img_id_caption_map_{self.split}.pkl"), "rb") as f:
                    self._img_id_caption_map = pickle.load(f)
                with open(os.path.join(
                        self.cluster_path,
                        f"img_id_filename_map_{self.split}.pkl"), "rb") as f:
                    self._img_id_filename_map = pickle.load(f)
            with open(os.path.join(
                    self.cluster_path,
                    f"img_id_cluster_map_{self.split}_{num}.pkl"), "rb") as f:
                self._img_id_cluster_map = pickle.load(f)
            self._cluster_img_ids = defaultdict(list)
            for img_id, cluster in self._img_id_cluster_map.items():
                self._cluster_img_ids[cluster].append(img_id)
            self.current_cluster_num = num

    def __len__(self):
        return len(self.reader)

    def __getitem__(self, idx: int):
        rng = self._rng(idx)
        self._maybe_reload_clusters()
        rec = self.reader[idx]
        image_id, image, captions = rec["image_id"], rec["image"], rec["captions"]
        caption = captions[0] if self.use_single_caption else \
            captions[int(rng.integers(len(captions)))]

        # Hard negative: another image from the same caption cluster.
        cluster_id = self._img_id_cluster_map[image_id]
        members = self._cluster_img_ids[cluster_id]
        neg_image_id = image_id
        while neg_image_id == image_id:
            neg_image_id = members[int(rng.integers(len(members)))]
        neg_image = _imread_rgb(os.path.join(
            self.coco_root, self._img_id_filename_map[neg_image_id]))
        neg_captions = self._img_id_caption_map[neg_image_id]
        neg_caption = neg_captions[int(rng.integers(len(neg_captions)))]

        pos = self.image_transform(image=image, caption=caption, rng=rng)
        neg = self.image_transform(image=neg_image, caption=neg_caption, rng=rng)
        pos_c = self.caption_transform(caption=pos["caption"], rng=rng)["caption"]
        neg_c = self.caption_transform(caption=neg["caption"], rng=rng)["caption"]
        ids, mask = self._tokenize(pos_c)
        nids, nmask = self._tokenize(neg_c)
        return {
            "image_id": np.int64(image_id),
            "image": np.asarray(pos["image"], np.float32),
            "input_ids": ids, "attention_mask": mask,
            "neg_image": np.asarray(neg["image"], np.float32),
            "neg_input_ids": nids, "neg_attention_mask": nmask,
        }


# ---------------------------------------------------------------------------
# Downstream eval datasets
# ---------------------------------------------------------------------------

class VOC07ClassificationDataset(Dataset):
    """PASCAL VOC 2007 multi-label classification
    (reference: data/dataloader.py:800-882).  Labels per class:
    1 present / 0 not present / -1 ignore."""

    def __init__(self, data_root: str, split: str = "trainval",
                 image_transform: Optional[Callable] = None):
        self.image_transform = image_transform or T.DEFAULT_IMAGE_TRANSFORM
        ann_paths = sorted(glob.glob(
            os.path.join(data_root, "ImageSets", "Main", f"*_{split}.txt")))
        self.class_names = [os.path.basename(p).split("_")[0]
                            for p in ann_paths]
        labels: Dict[str, np.ndarray] = defaultdict(
            lambda: -np.ones(len(self.class_names), np.int32))
        for cls_num, ann_path in enumerate(ann_paths):
            with open(ann_path) as f:
                for line in f:
                    name, orig = line.strip().split()
                    orig = int(orig)
                    # VOC -1 (absent) -> 0; VOC 0 (difficult) -> -1 (ignore)
                    labels[name][cls_num] = 0 if orig == -1 else \
                        -1 if orig == 0 else 1
        self.instances = [
            (os.path.join(data_root, "JPEGImages", f"{name}.jpg"), lab)
            for name, lab in labels.items()]

    def __len__(self):
        return len(self.instances)

    def __getitem__(self, idx: int):
        rng = self._rng(idx)
        path, label = self.instances[idx]
        out = self.image_transform(image=_imread_rgb(path), rng=rng)
        return {"image": np.asarray(out["image"], np.float32),
                "label": np.asarray(label, np.int64)}

    @staticmethod
    def collate_fn(items):
        return {k: np.stack([d[k] for d in items]) for k in items[0]}


class INaturalist2018Dataset(Dataset):
    """iNaturalist 2018 (8142 classes), json-annotated
    (reference: data/dataloader.py:885-946)."""

    def __init__(self, data_root: str, split: str = "train",
                 image_transform: Optional[Callable] = None):
        self.image_transform = image_transform or T.DEFAULT_IMAGE_TRANSFORM
        with open(os.path.join(data_root, "annotations",
                               f"{split}2018.json")) as f:
            annotations = json.load(f)
        self.image_id_to_file_path = {
            ann["id"]: os.path.join(data_root, ann["file_name"])
            for ann in annotations["images"]}
        self.instances = [(a["image_id"], a["category_id"])
                          for a in annotations["annotations"]]

    def __len__(self):
        return len(self.instances)

    def __getitem__(self, idx: int):
        rng = self._rng(idx)
        image_id, label = self.instances[idx]
        out = self.image_transform(
            image=_imread_rgb(self.image_id_to_file_path[image_id]), rng=rng)
        return {"image": np.asarray(out["image"], np.float32),
                "label": np.int64(label)}

    @staticmethod
    def collate_fn(items):
        return {k: np.stack([d[k] for d in items]) for k in items[0]}


class ImageNetDataset(Dataset):
    """ImageNet via directory-per-class layout with optional per-class
    percentage trimming for the data-efficiency ablations
    (reference: data/dataloader.py:949-1024 wraps torchvision ImageNet)."""

    def __init__(self, data_root: str, split: str = "train",
                 image_transform: Optional[Callable] = None,
                 percentage: float = 100.0):
        self.image_transform = image_transform or T.DEFAULT_IMAGE_TRANSFORM
        split_dir = os.path.join(data_root, split)
        classes = sorted(d for d in os.listdir(split_dir)
                         if os.path.isdir(os.path.join(split_dir, d)))
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            files = sorted(glob.glob(os.path.join(split_dir, c, "*")))
            if percentage < 100.0 and split == "train":
                keep = max(1, int(len(files) * percentage / 100.0))
                files = files[:keep]
            self.samples += [(f, self.class_to_idx[c]) for f in files]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int):
        rng = self._rng(idx)
        path, label = self.samples[idx]
        out = self.image_transform(image=_imread_rgb(path), rng=rng)
        return {"image": np.asarray(out["image"], np.float32),
                "label": np.int64(label)}

    @staticmethod
    def collate_fn(items):
        return {k: np.stack([d[k] for d in items]) for k in items[0]}


class ReEvalDataset(Dataset):
    """COCO image-text retrieval eval set: all val images + all captions,
    with img2txt/txt2img ground-truth maps
    (reference: data/dataloader.py:1055-1127)."""

    def __init__(self, data_root: str, split: str = "val",
                 image_transform: Optional[Callable] = None,
                 max_words: int = 30):
        self.image_transform = image_transform or T.DEFAULT_IMAGE_TRANSFORM
        image_dir = os.path.join(data_root, f"{split}2017")
        image_filenames = sorted(glob.glob(os.path.join(image_dir, "*.jpg")))
        self.id_filename = [
            (int(os.path.basename(p)[:-4]), p) for p in image_filenames]
        with open(os.path.join(data_root, "annotations",
                               f"captions_{split}2017.json")) as f:
            captions = json.load(f)
        id_to_captions = defaultdict(list)
        for ann in captions["annotations"]:
            id_to_captions[ann["image_id"]].append(ann["caption"])

        self.text: List[str] = []
        self.image: List[str] = []
        self.txt2img: Dict[int, int] = {}
        self.img2txt: Dict[int, List[int]] = {}
        txt_id = 0
        for img_idx, (img_id, img_path) in enumerate(self.id_filename):
            self.image.append(img_path)
            self.img2txt[img_idx] = []
            for caption in id_to_captions[img_id]:
                self.text.append(T.pre_caption(caption, max_words))
                self.img2txt[img_idx].append(txt_id)
                self.txt2img[txt_id] = img_idx
                txt_id += 1

    def __len__(self):
        return len(self.image)

    def __getitem__(self, idx: int):
        rng = self._rng(idx)
        img_id, path = self.id_filename[idx]
        out = self.image_transform(image=_imread_rgb(path), rng=rng)
        return {"image": np.asarray(out["image"], np.float32),
                "index": np.int64(idx)}

    @staticmethod
    def collate_fn(items):
        return {k: np.stack([d[k] for d in items]) for k in items[0]}


class FlickrReEvalDataset(Dataset):
    """Flickr30k retrieval eval from an ALBEF-style json annotation file
    (reference: data/dataloader.py:1130-1166, class re_eval_dataset)."""

    def __init__(self, data_root: str, ann_file: str, split: str = "val",
                 image_transform: Optional[Callable] = None,
                 max_words: int = 30):
        self.image_transform = image_transform or T.DEFAULT_IMAGE_TRANSFORM
        with open(ann_file) as f:
            self.ann = json.load(f)
        self.image_root = data_root
        self.text: List[str] = []
        self.image: List[str] = []
        self.txt2img: Dict[int, int] = {}
        self.img2txt: Dict[int, List[int]] = {}
        txt_id = 0
        for img_id, ann in enumerate(self.ann):
            self.image.append(ann["image"])
            self.img2txt[img_id] = []
            for caption in ann["caption"]:
                self.text.append(T.pre_caption(caption, max_words))
                self.img2txt[img_id].append(txt_id)
                self.txt2img[txt_id] = img_id
                txt_id += 1

    def __len__(self):
        return len(self.image)

    def __getitem__(self, idx: int):
        rng = self._rng(idx)
        path = os.path.join(self.image_root, self.ann[idx]["image"])
        out = self.image_transform(image=_imread_rgb(path), rng=rng)
        return {"image": np.asarray(out["image"], np.float32),
                "index": np.int64(idx)}

    @staticmethod
    def collate_fn(items):
        return {k: np.stack([d[k] for d in items]) for k in items[0]}


class CocoObjectGender(Dataset):
    """Gender-labeled COCO subset for the bias analysis tool
    (reference: data/dataloader.py:1169-1503): samples with person boxes
    annotated man/woman, with optional masking of the person region
    (none / blackout / blur) before encoding.

    Annotation format: ``{split}.pkl`` under ``ann_dir`` — a list of dicts
    {image_id, filename (relative to data_root), gender ('man'|'woman'),
    boxes [[x0,y0,x1,y1], ...]}.
    """

    def __init__(self, data_root: str, split: str = "val",
                 ann_dir: Optional[str] = None,
                 image_transform: Optional[Callable] = None,
                 mask_mode: str = "none"):
        self.image_transform = image_transform or T.DEFAULT_IMAGE_TRANSFORM
        self.data_root = data_root
        self.mask_mode = mask_mode
        ann_dir = ann_dir or os.path.join(data_root, "gender_annotations")
        with open(os.path.join(ann_dir, f"{split}.pkl"), "rb") as f:
            self.ann = pickle.load(f)
        self._masker = {"none": None, "blackout": T.BlackoutBox(),
                        "blur": T.BlurBox()}[mask_mode]

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, idx: int):
        rng = self._rng(idx)
        ann = self.ann[idx]
        image = _imread_rgb(os.path.join(self.data_root, ann["filename"]))
        sample = {"image": image, "boxes": ann.get("boxes", [])}
        if self._masker is not None:
            sample = self._masker(sample, rng)
        out = self.image_transform(image=sample["image"], rng=rng)
        return {
            "image": np.asarray(out["image"], np.float32),
            "gender": np.int64(0 if ann["gender"] == "man" else 1),
            "image_id": np.int64(ann["image_id"]),
        }

    @staticmethod
    def collate_fn(items):
        return {k: np.stack([d[k] for d in items]) for k in items[0]}
