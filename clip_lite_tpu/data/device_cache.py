"""HBM-resident dataset cache: the whole corpus lives on device and each
training batch is assembled by ONE compiled gather+crop program.

TPU-native answer to the host-input-bound regime (docs/PERF_NOTES.md
"Input pipeline"): when the decoded corpus fits in device memory
(N x cache^2 x 3 bytes — e.g. 100k images at 256^2 is 19.7 GB, 6k is
1.2 GB), decode + tokenize ONCE on the host, ship everything to the
device, and replace the per-step host pipeline with a jitted sampler:

    idx   = randint(N, (B,))                  # with-replacement sampling
    imgs  = images[idx]                       # HBM gather, ~0.2 GB/step
    imgs  = dynamic_slice(imgs, rand offsets) # per-sample random crop
    ids   = token_ids[idx, randint(n_caps)]   # random caption per item

The compiled train step then finishes augmentation on device exactly as
the native host path does (random flip + color jitter + normalize,
engine._maybe_device_preprocess) — images leave the cache as uint8.

Semantics vs the host DataLoader path (all documented divergences):
  * sampling is i.i.d. WITH replacement (the host path shuffles
    without replacement per epoch) — immaterial for multi-hundred-epoch
    pretraining on a small corpus, and it keeps the sampler stateless:
    batch contents are a pure function of (seed, step), so resume at
    iteration K replays the exact stream by construction;
  * the scale/aspect jitter of random_resized_crop becomes a random
    TRANSLATION crop of the square cache tile (crop_size out of
    cache_size); flip and color jitter are unchanged (device-side);
  * caption-aware flip word-swap is not applied — same contract as the
    native host pipeline (data/datasets.py CocoCaptionsDataset note);
  * DATA.SEQ_BUCKETS trims STATICALLY to the smallest bucket holding the
    longest caption in the corpus (one compiled shape for the whole run,
    not per-batch).

The reference has no equivalent (its DataLoader always round-trips the
host, reference: train.py:78-117); this is pure TPU-first surface.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _static_seq_len(max_len: int, seq_buckets, fallback: int) -> int:
    """Smallest configured bucket holding the corpus max caption length."""
    if not seq_buckets:
        return fallback
    for b in sorted(seq_buckets):
        if max_len <= b:
            return int(b)
    return fallback


class DeviceDataCache:
    """Decode + tokenize a caption dataset once; sample batches on device.

    ``dataset`` is a CocoCaptionsDataset (or anything exposing
    ``reader``/``native_reader``, ``_tokenize`` and ``caption_transform``
    the same way).  Images are decoded to a fixed square
    ``cache_size`` tile; training crops ``crop_size`` windows at random
    offsets on device.
    """

    def __init__(self, dataset, mesh: Mesh, batch_size: int,
                 data_axis: str = "data", cache_size: int = 256,
                 crop_size: int = 224, seq_buckets=None,
                 seed: int = 0):
        if cache_size < crop_size:
            raise ValueError(
                f"cache_size {cache_size} < crop_size {crop_size}")
        self.batch_size = batch_size
        self.crop_size = crop_size
        self.cache_size = cache_size
        self._base_rng = jax.random.PRNGKey(seed ^ 0x5EED)

        images, ids, mask, n_caps, image_ids = self._load_host(
            dataset, cache_size)
        max_len = int(mask.sum(axis=-1).max())
        seq = _static_seq_len(max_len, seq_buckets, ids.shape[-1])
        ids = ids[..., :seq]
        mask = mask[..., :seq]

        # Replicated on the mesh: every device holds the full corpus and
        # gathers its own batch shard's rows.
        rep = NamedSharding(mesh, P())
        self._images = jax.device_put(images, rep)
        self._ids = jax.device_put(ids, rep)
        self._mask = jax.device_put(mask, rep)
        self._n_caps = jax.device_put(n_caps, rep)
        self._image_ids = jax.device_put(image_ids, rep)
        self._n = images.shape[0]

        batch_sharding = NamedSharding(mesh, P(data_axis))
        self._sample = jax.jit(
            self._make_sampler(),
            out_shardings={"image": batch_sharding,
                           "input_ids": batch_sharding,
                           "attention_mask": batch_sharding,
                           "image_id": batch_sharding})
        self._step = 0

    # -- host pass ---------------------------------------------------

    @staticmethod
    def _load_host(dataset, cache_size: int):
        """Decode every image to (cache, cache, 3) u8 and tokenize every
        caption.  Uses the fused native decode when built."""
        from clip_lite_tpu.data import native

        n = len(dataset)
        reader = dataset.reader
        use_native = getattr(dataset, "native_pipeline", False)

        images = np.empty((n, cache_size, cache_size, 3), np.uint8)
        ids_per_item, mask_per_item = [], []
        n_caps = np.empty(n, np.int32)
        image_ids = np.empty(n, np.int64)

        chunk = 256
        for lo in range(0, n, chunk):
            idxs = range(lo, min(lo + chunk, n))
            if use_native:
                recs = [dataset.native_reader[int(reader._indices[i])]
                        for i in idxs]
                jpegs = [r["image"] for r in recs]
                boxes = np.full((len(jpegs), 4), -1.0, np.float32)
                flips = np.zeros(len(jpegs), np.uint8)
                import os

                tiles, _ = native.decode_crop_batch(
                    jpegs, cache_size, boxes, flips,
                    num_threads=max(1, os.cpu_count() or 1))
                images[lo:lo + len(jpegs)] = tiles
                caps_list = [r["captions"] for r in recs]
                image_ids[lo:lo + len(recs)] = [r["image_id"] for r in recs]
            else:
                caps_list = []
                for j, i in enumerate(idxs):
                    rec = reader[i]
                    img = rec["image"]
                    images[lo + j] = _resize_square(img, cache_size)
                    caps_list.append(rec["captions"])
                    image_ids[lo + j] = rec["image_id"]
            for j, caps in enumerate(caps_list):
                caps = caps if isinstance(caps, list) else [caps]
                item_ids, item_mask = [], []
                for cap in caps:
                    cap = dataset.caption_transform(
                        caption=cap, rng=np.random.default_rng(0))["caption"]
                    tid, tmask = dataset._tokenize(cap)
                    item_ids.append(tid)
                    item_mask.append(tmask)
                ids_per_item.append(np.stack(item_ids))
                mask_per_item.append(np.stack(item_mask))
                n_caps[lo + j] = len(caps)

        c_max = max(x.shape[0] for x in ids_per_item)
        s = ids_per_item[0].shape[1]
        ids = np.zeros((n, c_max, s), np.int32)
        mask = np.zeros((n, c_max, s), np.int32)
        for i, (ii, mm) in enumerate(zip(ids_per_item, mask_per_item)):
            # Pad the caption axis by repeating caption 0 so a uniform
            # randint over [0, n_caps[i]) never reads padding anyway.
            ids[i, :ii.shape[0]] = ii
            mask[i, :mm.shape[0]] = mm
        return images, ids, mask, n_caps, image_ids

    # -- device sampler ----------------------------------------------

    def _make_sampler(self):
        b = self.batch_size
        crop = self.crop_size
        span = self.cache_size - crop + 1

        def sample(images, ids, mask, n_caps, image_ids, rng):
            k_idx, k_cap, k_crop = jax.random.split(rng, 3)
            n = images.shape[0]
            idx = jax.random.randint(k_idx, (b,), 0, n)
            imgs = jnp.take(images, idx, axis=0)
            off = jax.random.randint(k_crop, (b, 2), 0, span)

            def crop_one(im, o):
                return lax.dynamic_slice(im, (o[0], o[1], 0),
                                         (crop, crop, 3))

            imgs = jax.vmap(crop_one)(imgs, off)
            cap = jax.random.randint(k_cap, (b,), 0,
                                     jnp.take(n_caps, idx, axis=0))
            bids = jnp.take(ids, idx, axis=0)[jnp.arange(b), cap]
            bmask = jnp.take(mask, idx, axis=0)[jnp.arange(b), cap]
            return {"image": imgs, "input_ids": bids,
                    "attention_mask": bmask,
                    "image_id": jnp.take(image_ids, idx, axis=0)}

        return sample

    def set_start(self, step: int) -> None:
        """Resume point: iteration the next ``__iter__`` batch is for."""
        self._step = int(step)

    def batch_at(self, step: int) -> Dict[str, jax.Array]:
        """Batch for iteration ``step`` — pure function of (seed, step),
        so checkpoint resume replays the exact stream."""
        rng = jax.random.fold_in(self._base_rng, step)
        return self._sample(self._images, self._ids, self._mask,
                            self._n_caps, self._image_ids, rng)

    def __iter__(self):
        while True:
            batch = self.batch_at(self._step)
            self._step += 1
            yield batch

    def memory_bytes(self) -> int:
        return (self._images.size + 4 * self._ids.size * 2 +
                4 * self._n_caps.size)


def _resize_square(img: np.ndarray, size: int) -> np.ndarray:
    """Center-crop to square then resize (python fallback path)."""
    import cv2

    h, w = img.shape[:2]
    s = min(h, w)
    y0, x0 = (h - s) // 2, (w - s) // 2
    sq = img[y0:y0 + s, x0:x0 + s]
    return cv2.resize(sq, (size, size), interpolation=cv2.INTER_AREA)
