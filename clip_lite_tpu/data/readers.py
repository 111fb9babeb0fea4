"""CLRec record store + readers: the serialized-dataset layer.

The reference serializes COCO into LMDB with pickled
``(image_id, image_ndarray, captions)`` tuples
(reference: data/readers.py:76-178, scripts/coco_preprocess.py:113-139).
LMDB python bindings are not part of this environment, and raw-ndarray
records are wasteful, so the framework defines its own append-only record
format, **CLRec**:

    name.clrec       [magic "CLREC001"][u64 count][records: u64 len + bytes]
    name.clrec.idx   [u64 x (count+1)] record byte offsets (last = EOF)

Readers mmap both files — O(1) random access, zero-copy slicing, safe to
share across worker threads and (unlike LMDB txns) across forks.  Records
are pickled dicts ``{"image_id", "image" (encoded JPEG bytes or ndarray),
"captions", ...}``; JPEG-encoding keeps files ~10x smaller than the
reference's raw arrays and decode overlaps with device compute.  A native
C++ reader (native/) accelerates batched reads; this module is the
always-available pure-Python implementation with the same format.
"""

from __future__ import annotations

import mmap
import os
import pickle
import struct
from typing import Any, Dict, Iterable, List, Optional

import cv2
import numpy as np

MAGIC = b"CLREC001"


class ClRecWriter:
    """Append-only CLRec writer; call close() (or use as context manager)
    to finalize the index."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "wb")
        self._f.write(MAGIC)
        self._f.write(struct.pack("<Q", 0))  # count patched on close
        self._offsets: List[int] = [self._f.tell()]
        self._count = 0

    def append(self, record: Any) -> None:
        payload = pickle.dumps(record, protocol=4)
        self._f.write(struct.pack("<Q", len(payload)))
        self._f.write(payload)
        self._offsets.append(self._f.tell())
        self._count += 1

    def close(self) -> None:
        self._f.seek(len(MAGIC))
        self._f.write(struct.pack("<Q", self._count))
        self._f.close()
        with open(self.path + ".idx", "wb") as f:
            f.write(np.asarray(self._offsets, dtype=np.uint64).tobytes())

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ClRecReader:
    """mmap-backed random-access reader."""

    def __init__(self, path: str):
        self.path = path
        self._file = open(path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        if self._mm[: len(MAGIC)] != MAGIC:
            raise ValueError(f"{path}: not a CLRec file")
        (self._count,) = struct.unpack_from("<Q", self._mm, len(MAGIC))
        idx_path = path + ".idx"
        if os.path.exists(idx_path):
            self._offsets = np.fromfile(idx_path, dtype=np.uint64)
        else:  # rebuild by scanning
            offsets = [len(MAGIC) + 8]
            pos = offsets[0]
            for _ in range(self._count):
                (ln,) = struct.unpack_from("<Q", self._mm, pos)
                pos += 8 + ln
                offsets.append(pos)
            self._offsets = np.asarray(offsets, dtype=np.uint64)

    def __len__(self) -> int:
        return self._count

    def __getitem__(self, i: int) -> Any:
        off = int(self._offsets[i])
        (ln,) = struct.unpack_from("<Q", self._mm, off)
        return pickle.loads(self._mm[off + 8: off + 8 + ln])

    def close(self):
        self._mm.close()
        self._file.close()

    # Readers are shared across dataloader worker threads; mmap handles
    # make them fork/pickle-unsafe, so re-open lazily after pickling
    # (same trick as the reference's LMDB reader, data/readers.py:151-169).
    def __getstate__(self):
        return {"path": self.path}

    def __setstate__(self, state):
        self.__init__(state["path"])


def encode_image(image_rgb: np.ndarray, quality: int = 95) -> bytes:
    ok, buf = cv2.imencode(
        ".jpg", cv2.cvtColor(image_rgb, cv2.COLOR_RGB2BGR),
        [int(cv2.IMWRITE_JPEG_QUALITY), quality])
    if not ok:
        raise ValueError("JPEG encode failed")
    return buf.tobytes()


def decode_image(data) -> np.ndarray:
    """JPEG bytes or ndarray -> RGB HWC uint8."""
    if isinstance(data, np.ndarray) and data.ndim == 3:
        return data
    buf = np.frombuffer(data, np.uint8)
    img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class CocoCaptionsRecordReader:
    """Dataset-facing reader: CLRec of {image_id, image, captions} with
    percentage subsampling (reference: data/readers.py:76-178)."""

    def __init__(self, path: str, percentage: float = 100.0):
        self.reader = ClRecReader(path)
        n = len(self.reader)
        keep = n if percentage >= 100.0 else max(1, int(n * percentage / 100.0))
        self._indices = np.arange(n)[:keep]
        if percentage < 100.0:
            import logging

            logging.getLogger("clip_lite_tpu").info(
                "Keeping %d/%d records (%.1f%%)", keep, n, percentage)

    def __len__(self) -> int:
        return len(self._indices)

    def __getitem__(self, i: int) -> Dict[str, Any]:
        rec = self.reader[int(self._indices[i])]
        if isinstance(rec, tuple):  # (image_id, image, captions) parity form
            rec = {"image_id": rec[0], "image": rec[1], "captions": rec[2]}
        rec["image"] = decode_image(rec["image"])
        return rec

    def captions(self, i: int):
        """Captions of record ``i`` without decoding its JPEG — used by
        sequence-length bucketing to scan lengths cheaply."""
        rec = self.reader[int(self._indices[i])]
        if isinstance(rec, tuple):
            return rec[2]
        return rec["captions"]


class CocoCaptionsDirReader:
    """Raw COCO directory reader: images/{split}2017/*.jpg +
    annotations/captions_{split}2017.json
    (reference: data/readers.py:24-73)."""

    def __init__(self, data_root: str, split: str):
        import json

        ann = os.path.join(data_root,
                           f"annotations/captions_{split}2017.json")
        with open(ann) as f:
            data = json.load(f)
        cap_by_img: Dict[int, List[str]] = {}
        for a in data["annotations"]:
            cap_by_img.setdefault(a["image_id"], []).append(a["caption"])
        self.items = [
            (img["id"],
             os.path.join(data_root, f"images/{split}2017", img["file_name"]),
             cap_by_img.get(img["id"], []))
            for img in data["images"] if img["id"] in cap_by_img
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i: int) -> Dict[str, Any]:
        image_id, path, captions = self.items[i]
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return {"image_id": image_id, "image": img, "captions": captions}
