"""Native data-plane tests: C++ CLRec reader parity with the Python reader,
fused decode/crop/flip correctness vs the cv2 host path."""

import numpy as np
import pytest

from clip_lite_tpu.data import native
from clip_lite_tpu.data.readers import ClRecWriter, ClRecReader, encode_image

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native library not built")


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("clrec") / "t.clrec")
    rng = np.random.RandomState(0)
    images = []
    with ClRecWriter(path) as w:
        for i in range(6):
            y, x = np.mgrid[0:40, 0:56]
            img = np.stack([(y * (i + 2)) % 256, (x * 3) % 256,
                            (x + y + i) % 256], -1).astype(np.uint8)
            images.append(img)
            w.append({"image_id": i, "image": encode_image(img, 100),
                      "captions": [f"cap {i}"]})
    return path, images


def test_native_reader_matches_python(store):
    path, _ = store
    py = ClRecReader(path)
    nat = native.NativeClRecReader(path)
    assert len(py) == len(nat) == 6
    for i in [0, 3, 5]:
        a, b = py[i], nat[i]
        assert a["image_id"] == b["image_id"]
        assert a["captions"] == b["captions"]
        assert a["image"] == b["image"]


def test_native_reader_pickle(store):
    import pickle

    path, _ = store
    nat = native.NativeClRecReader(path)
    nat2 = pickle.loads(pickle.dumps(nat))
    assert nat2[1]["image_id"] == 1


def test_decode_full_resize_matches_cv2(store):
    import cv2

    path, images = store
    nat = native.NativeClRecReader(path)
    jpegs = [nat[i]["image"] for i in range(6)]
    boxes = np.full((6, 4), -1.0, np.float32)  # full-image resize
    flips = np.zeros(6, np.uint8)
    out, failures = native.decode_crop_batch(jpegs, 32, boxes, flips,
                                             num_threads=2)
    assert failures == 0
    assert out.shape == (6, 32, 32, 3)
    for i in range(6):
        ref = cv2.resize(images[i], (32, 32), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(out[i].astype(int) - ref.astype(int)).mean()
        assert diff < 12, diff  # jpeg loss + sampling differences


def test_decode_flip(store):
    path, _ = store
    nat = native.NativeClRecReader(path)
    jpegs = [nat[0]["image"]] * 2
    boxes = np.full((2, 4), -1.0, np.float32)
    out, _ = native.decode_crop_batch(
        jpegs, 32, boxes, np.asarray([0, 1], np.uint8))
    np.testing.assert_array_equal(out[1], out[0][:, ::-1])


def test_decode_crop_region(store):
    path, _ = store
    nat = native.NativeClRecReader(path)
    jpeg = nat[2]["image"]
    full, _ = native.decode_crop_batch(
        [jpeg], 64, np.full((1, 4), -1.0, np.float32),
        np.zeros(1, np.uint8))
    # top-left quadrant crop should match the corresponding region of a
    # 2x-size full decode (approximately).
    quad, _ = native.decode_crop_batch(
        [jpeg], 32, np.asarray([[0, 0, 0.5, 0.5]], np.float32),
        np.zeros(1, np.uint8))
    diff = np.abs(quad[0].astype(int) - full[0][:32, :32].astype(int)).mean()
    assert diff < 14, diff


def test_bad_jpeg_zero_fills(store):
    out, failures = native.decode_crop_batch(
        [b"not a jpeg"], 16, np.full((1, 4), -1.0, np.float32),
        np.zeros(1, np.uint8))
    assert failures == 1
    assert out.sum() == 0


def test_crop_box_sampler_bounds():
    rng = np.random.default_rng(0)
    boxes = native.random_resized_crop_boxes(rng, 100)
    assert (boxes[:, 0] >= 0).all() and (boxes[:, 2] <= 1.0001).all()
    assert (boxes[:, 2] > boxes[:, 0]).all()
