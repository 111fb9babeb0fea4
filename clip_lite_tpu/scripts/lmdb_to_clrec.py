"""Migrate a reference-serialized LMDB into the CLRec record store.

The reference serializes COCO as an LMDB of pickled
``(image_id, image_ndarray_or_vectors, captions)`` tuples under ASCII
integer keys (reference: data/readers.py:105-126,
scripts/coco_preprocess.py:113-139).  This environment has no LMDB
bindings for the training path, and CLRec (data/readers.py here) is the
framework's native format — anyone holding reference LMDBs runs this
once instead of re-preprocessing from raw COCO.

Package-gated on ``import lmdb``: the converter is the ONLY place the
binding is needed, and it fails with a clear message when absent.

Usage:
    python -m clip_lite_tpu.scripts.lmdb_to_clrec \
        --lmdb /data/coco_train_sbert2017.lmdb \
        --out  /data/coco_train_sbert2017.clrec [--jpeg-quality 95]

Raw ndarray images are JPEG-compressed on the way in (the CLRec
convention — ~10x smaller, native-decoder friendly); sbert-mode records
whose "image" is a feature matrix are stored as-is.
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def convert(lmdb_path: str, out_path: str, jpeg_quality: int = 95,
            limit: int = 0) -> int:
    try:
        import lmdb
    except ImportError as e:
        raise RuntimeError(
            "LMDB migration needs the python-lmdb package (pip install "
            "lmdb); only this converter depends on it") from e

    from clip_lite_tpu.data.readers import ClRecWriter, encode_image

    env = lmdb.open(lmdb_path, subdir=False, readonly=True, lock=False,
                    readahead=False, map_size=1099511627776 * 2)
    n = env.stat()["entries"]
    if limit:
        n = min(n, limit)
    txn = env.begin()
    written = 0
    with ClRecWriter(out_path) as w:
        for i in range(n):
            raw = txn.get(f"{i}".encode("ascii"))
            if raw is None:
                continue
            image_id, image, captions = pickle.loads(raw)
            if isinstance(image, np.ndarray) and image.ndim == 3 and \
                    image.dtype == np.uint8:
                image = encode_image(image, quality=jpeg_quality)
            w.append({"image_id": image_id, "image": image,
                      "captions": captions})
            written += 1
    env.close()
    return written


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lmdb", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--jpeg-quality", type=int, default=95)
    p.add_argument("--limit", type=int, default=0,
                   help="Convert only the first N records (0 = all).")
    a = p.parse_args()
    n = convert(a.lmdb, a.out, a.jpeg_quality, a.limit)
    print(f"Wrote {n} records to {a.out}")


if __name__ == "__main__":
    main()
