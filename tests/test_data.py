"""Data layer tests: CLRec store, transforms, tokenizers, datasets,
loader determinism, k-means, metrics, retrieval eval math."""

import json
import os

import numpy as np
import pytest

from clip_lite_tpu.data import transforms as T
from clip_lite_tpu.data.readers import (
    ClRecReader,
    ClRecWriter,
    decode_image,
    encode_image,
)
from clip_lite_tpu.data.tokenizers import (
    GloveTokenizer,
    HashingTokenizer,
    simple_word_tokenize,
)
from clip_lite_tpu.data.datasets import RandomDataset, JsonDataset
from clip_lite_tpu.data.pipeline import DataLoader, infinite_batches


# ---------------------------------------------------------------------------
# CLRec record store
# ---------------------------------------------------------------------------

def test_clrec_roundtrip(tmp_path):
    path = str(tmp_path / "test.clrec")
    records = [{"image_id": i, "captions": [f"caption {i}"] * 3,
                "blob": np.arange(i + 1)} for i in range(10)]
    with ClRecWriter(path) as w:
        for r in records:
            w.append(r)
    r = ClRecReader(path)
    assert len(r) == 10
    assert r[3]["image_id"] == 3
    np.testing.assert_array_equal(r[9]["blob"], np.arange(10))
    # Index-less recovery (delete .idx)
    os.remove(path + ".idx")
    r2 = ClRecReader(path)
    assert r2[5]["image_id"] == 5


def test_clrec_pickle_reopens(tmp_path):
    import pickle

    path = str(tmp_path / "t.clrec")
    with ClRecWriter(path) as w:
        w.append({"x": 1})
    r = ClRecReader(path)
    r2 = pickle.loads(pickle.dumps(r))
    assert r2[0]["x"] == 1


def test_jpeg_encode_decode_roundtrip():
    # Smooth gradient (JPEG-friendly; pure noise is its worst case).
    y, x = np.mgrid[0:48, 0:64]
    img = np.stack([y * 5 % 256, x * 4 % 256, (x + y) * 2 % 256],
                   axis=-1).astype(np.uint8)
    out = decode_image(encode_image(img, quality=100))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3  # lossy
    # ndarray passthrough
    np.testing.assert_array_equal(decode_image(img), img)


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------

def test_pre_caption():
    assert T.pre_caption("A Man, riding: a wave!") == "a man riding a wave"
    long = " ".join(["word"] * 50)
    assert len(T.pre_caption(long, 30).split()) == 30


def test_horizontal_flip_swaps_caption():
    rng = np.random.default_rng(0)
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    flip = T.HorizontalFlip(p=1.0)
    out = flip({"image": img, "caption": "left hand right turn"}, rng)
    assert out["caption"] == "right hand left turn"
    np.testing.assert_array_equal(out["image"], img[:, ::-1])


def test_normalize_values():
    rng = np.random.default_rng(0)
    img = np.full((4, 4, 3), 255, np.uint8)
    out = T.Normalize()({"image": img}, rng)["image"]
    expected = (255.0 - np.asarray(T.IMAGENET_COLOR_MEAN) * 255) / (
        np.asarray(T.IMAGENET_COLOR_STD) * 255)
    np.testing.assert_allclose(out[0, 0], expected, rtol=1e-5)


def test_random_resized_crop_shape():
    rng = np.random.default_rng(0)
    img = np.zeros((100, 180, 3), np.uint8)
    out = T.RandomResizedSquareCrop(64)({"image": img}, rng)["image"]
    assert out.shape == (64, 64, 3)


def test_center_crop_upscales_small():
    rng = np.random.default_rng(0)
    img = np.zeros((30, 50, 3), np.uint8)
    out = T.CenterSquareCrop(64)({"image": img}, rng)["image"]
    assert out.shape == (64, 64, 3)


def test_color_jitter_stays_uint8():
    rng = np.random.default_rng(0)
    img = np.random.RandomState(0).randint(0, 256, (32, 32, 3), np.uint8)
    out = T.ColorJitter(p=1.0)({"image": img}, rng)["image"]
    assert out.dtype == np.uint8
    assert out.shape == img.shape


# ---------------------------------------------------------------------------
# Tokenizers
# ---------------------------------------------------------------------------

def test_hashing_tokenizer_contract():
    tok = HashingTokenizer(vocab_size=30522, max_length=10)
    out = tok("a man riding a wave", padding="max_length", truncation=True,
              max_length=10)
    ids, mask = out["input_ids"], out["attention_mask"]
    assert len(ids) == 10 and len(mask) == 10
    assert ids[0] == 101  # CLS
    assert 102 in ids  # SEP
    assert mask[sum(mask):] == [0] * (10 - sum(mask))
    out2 = tok("a man riding a wave", max_length=10)
    assert out2["input_ids"] == ids  # deterministic


def test_glove_tokenizer():
    tok = GloveTokenizer(word_dict={"hello": 0, "world": 1})
    ids = tok.encode("hello world unknownword")
    assert ids[:2] == [0, 1]
    assert ids[2] == tok.token_to_id("<unk>")


# ---------------------------------------------------------------------------
# Datasets + loader
# ---------------------------------------------------------------------------

def test_random_dataset_batch_shapes():
    ds = RandomDataset(mode="train_sbert", length=64, image_size=32,
                       max_caption_length=12,
                       image_transform=T.Compose([
                           T.RandomResizedSquareCrop(32), T.Normalize()]))
    items = [ds[i] for i in range(4)]
    batch = ds.collate_fn(items)
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["input_ids"].shape == (4, 12)
    assert batch["attention_mask"].shape == (4, 12)


def test_random_dataset_ssl_keys():
    ds = RandomDataset(mode="train_sbert", length=16, image_size=32,
                       visual_self_supervised=True,
                       textual_self_supervised=True,
                       image_transform=T.Compose([T.SquareResize(32)]))
    item = ds[0]
    assert "aug_image" in item and "aug_input_ids" in item


def test_dataset_deterministic_per_epoch():
    ds = RandomDataset(mode="train_sbert", length=16, image_size=32,
                       image_transform=T.Compose([T.SquareResize(32)]))
    ds.set_epoch(0)
    a = ds[3]["image"]
    b = ds[3]["image"]
    np.testing.assert_array_equal(a, b)
    ds.set_epoch(1)
    c = ds[3]["image"]
    assert not np.array_equal(a, c)


def test_json_dataset(tmp_path):
    import cv2

    img_path = str(tmp_path / "img.jpg")
    cv2.imwrite(img_path, np.zeros((40, 40, 3), np.uint8))
    ann = [{"image": img_path, "caption": ["a test image", "another cap"]}]
    jf = tmp_path / "ann.json"
    jf.write_text(json.dumps(ann))
    ds = JsonDataset([str(jf)], mode="train_sbert",
                     image_transform=T.Compose([T.SquareResize(32),
                                                T.Normalize()]))
    assert len(ds) == 1
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)


def test_loader_epoch_reshuffle_and_len():
    ds = RandomDataset(mode="train_sbert", length=32, image_size=32,
                       image_transform=T.Compose([T.SquareResize(32)]))
    loader = DataLoader(ds, batch_size=8, shuffle=True, num_workers=2,
                        background=False)
    assert len(loader) == 4
    loader.set_epoch(0)
    o0 = loader._epoch_order().tolist()
    loader.set_epoch(1)
    o1 = loader._epoch_order().tolist()
    assert o0 != o1
    assert sorted(o0) == list(range(32))


def test_loader_shard_index_must_be_explicit_and_in_range():
    """num_shards > 1 with a defaulted shard_index would silently load the
    SAME data on every host; it must be an error instead."""
    ds = RandomDataset(mode="train_sbert", length=32, image_size=32,
                       image_transform=T.Compose([T.SquareResize(32)]))
    with pytest.raises(ValueError, match="explicit"):
        DataLoader(ds, batch_size=8, num_workers=1, num_shards=2,
                   background=False)
    with pytest.raises(ValueError, match="out of range"):
        DataLoader(ds, batch_size=8, num_workers=1, num_shards=2,
                   shard_index=2, background=False)
    with pytest.raises(ValueError, match="out of range"):
        DataLoader(ds, batch_size=8, num_workers=1, num_shards=2,
                   shard_index=-1, background=False)


class _BoomDataset(RandomDataset):
    """Raises mid-epoch to exercise producer-thread error propagation."""

    def __getitem__(self, idx):
        if idx == 5:
            raise RuntimeError("decode failed for item 5")
        return super().__getitem__(idx)


def test_loader_background_producer_error_propagates():
    """A crash on the producer thread must re-raise in the consumer, not
    read as a silently-truncated epoch (e.g. a val sweep over 0 batches)."""
    ds = _BoomDataset(mode="train_sbert", length=16, image_size=32,
                      image_transform=T.Compose([T.SquareResize(32)]))
    loader = DataLoader(ds, batch_size=8, shuffle=False, num_workers=1,
                        background=True, num_shards=1, shard_index=0)
    with pytest.raises(RuntimeError, match="decode failed"):
        for _ in loader:
            pass


def test_infinite_batches_resume_exact():
    ds = RandomDataset(mode="train_sbert", length=32, image_size=32,
                       image_transform=T.Compose([T.SquareResize(32)]))
    loader = DataLoader(ds, batch_size=8, shuffle=True, num_workers=1)
    seq = [next(infinite_batches(DataLoader(
        ds, 8, shuffle=True, num_workers=1), start_iteration=i))
        for i in range(6)]
    stream = infinite_batches(DataLoader(ds, 8, shuffle=True, num_workers=1),
                              start_iteration=0)
    for i in range(6):
        b = next(stream)
        np.testing.assert_array_equal(b["input_ids"], seq[i]["input_ids"])


# ---------------------------------------------------------------------------
# k-means, metrics, retrieval math
# ---------------------------------------------------------------------------

def test_kmeans_separates_blobs():
    from clip_lite_tpu.scripts.cluster import kmeans

    rng = np.random.RandomState(0)
    a = rng.randn(50, 8) + 10
    b = rng.randn(50, 8) - 10
    x = np.concatenate([a, b])
    assign, _ = kmeans(x, 2, iters=20)
    assert len(set(assign[:50])) == 1
    assert len(set(assign[50:])) == 1
    assert assign[0] != assign[50]


def test_topk_accuracy():
    from clip_lite_tpu.utils.metrics import TopkAccuracy

    acc = TopkAccuracy(top_k=1)
    logits = np.asarray([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]])
    acc(logits, np.asarray([1, 0, 0]))
    assert acc.get_metric() == pytest.approx(100 * 2 / 3)
    acc5 = TopkAccuracy(top_k=2)
    acc5(logits, np.asarray([0, 1, 0]))
    assert acc5.get_metric() == 100.0


def test_cider_perfect_match_beats_mismatch():
    from clip_lite_tpu.utils.metrics import CocoCaptionsEvaluator

    gt = {"1": ["a man riding a wave on a surfboard",
                "a surfer rides an ocean wave"],
          "2": ["a red truck parked on the street",
                "a truck on a city street"]}
    ev = CocoCaptionsEvaluator(gt)
    good = ev.evaluate([
        {"image_id": "1", "caption": "a man riding a wave on a surfboard"},
        {"image_id": "2", "caption": "a red truck parked on the street"}])
    bad = ev.evaluate([
        {"image_id": "1", "caption": "purple elephants dancing"},
        {"image_id": "2", "caption": "purple elephants dancing"}])
    assert good["CIDEr"] > bad["CIDEr"]
    assert bad["CIDEr"] < 5.0
    # Two-key contract (reference utils/metrics.py:126): SPICE reported
    # as None when the Java toolchain is absent, never dropped.
    assert "SPICE" in good
    from clip_lite_tpu.utils.metrics import spice_available
    if not spice_available():
        assert good["SPICE"] is None
    # Tokenizer identity is reported (PTB3 parity pinned by the golden
    # set in tests/test_metrics.py).
    assert good["tokenizer"] == "ptb3"


def test_spice_gating(monkeypatch, tmp_path):
    from clip_lite_tpu.utils import metrics as M

    monkeypatch.delenv("CLIP_LITE_SPICE_JAR", raising=False)
    assert not M.spice_available()
    with pytest.raises(RuntimeError, match="JVM"):
        M.spice_score({"1": ["a"]}, {"1": ["a"]})
    # jar present but (likely) no JVM, or JVM present but jar invalid:
    # available() must require BOTH.
    jar = tmp_path / "spice-1.0.jar"
    jar.write_bytes(b"not a real jar")
    import shutil
    if shutil.which("java") is None:
        assert not M.spice_available(str(jar))


def test_itm_eval_perfect_embeddings():
    from clip_lite_tpu.eval_utils import itm_eval

    # 4 images, 2 captions each, perfectly separable.
    rng = np.random.RandomState(0)
    img = np.eye(4)
    txt = np.repeat(np.eye(4), 2, axis=0) + 0.01 * rng.randn(8, 4)
    sims = img @ txt.T
    img2txt = {i: [2 * i, 2 * i + 1] for i in range(4)}
    txt2img = {t: t // 2 for t in range(8)}
    res = itm_eval(sims, sims.T, txt2img, img2txt)
    assert res["txt_r1"] == 100.0
    assert res["img_r1"] == 100.0
    assert res["r_mean"] == 100.0


def test_lmdb_to_clrec_migration(monkeypatch, tmp_path):
    """Reference-LMDB -> CLRec converter, driven against a fake lmdb
    module (the binding is absent here; the converter is its only user)."""
    import pickle
    import sys
    import types

    import cv2

    y, x = np.mgrid[0:32, 0:48]
    img = np.stack([y * 5 % 256, x * 4 % 256, (x + y) * 2 % 256],
                   axis=-1).astype(np.uint8)
    records = {
        b"0": pickle.dumps((17, img, ["a dog", "a brown dog"])),
        b"1": pickle.dumps((42, np.random.RandomState(1).rand(5, 768)
                            .astype(np.float32), ["a cat"])),
    }

    class FakeTxn:
        def get(self, key):
            return records.get(key)

    class FakeEnv:
        def stat(self):
            return {"entries": len(records)}

        def begin(self):
            return FakeTxn()

        def close(self):
            pass

    fake = types.ModuleType("lmdb")
    fake.open = lambda *a, **k: FakeEnv()
    monkeypatch.setitem(sys.modules, "lmdb", fake)

    from clip_lite_tpu.scripts.lmdb_to_clrec import convert

    out = str(tmp_path / "mig.clrec")
    assert convert("/nonexistent.lmdb", out) == 2

    from clip_lite_tpu.data.readers import CocoCaptionsRecordReader

    r = CocoCaptionsRecordReader(out)
    assert len(r) == 2
    rec = r[0]
    assert rec["image_id"] == 17
    assert rec["captions"] == ["a dog", "a brown dog"]
    # JPEG round trip: close but lossy
    assert rec["image"].shape == img.shape
    assert np.mean(np.abs(rec["image"].astype(int) - img.astype(int))) < 6
    # sbert-mode feature records stored verbatim
    raw = r.reader[1]
    assert raw["image"].shape == (5, 768)


def test_tokenizer_respects_model_vocab_size():
    """MODEL.TEXTUAL.VOCAB_SIZE must bound every id the data pipeline
    emits: OOB ids silently NaN the embedding lookup under XLA (jnp.take
    fill semantics), unlike torch's loud index error.  Regression: the
    HashingTokenizer fallback used to hash into the full 30522 BERT vocab
    regardless of the configured embedding size."""
    from clip_lite_tpu.config import Config
    from clip_lite_tpu.data.tokenizers import HashingTokenizer
    from clip_lite_tpu.factories import PretrainingDatasetFactory

    tok = HashingTokenizer(vocab_size=512)
    enc = tok("a photo of two dogs playing catch in the park")
    assert max(enc["input_ids"]) < 512

    cfg = Config(override_list=[
        "MODEL.NAME", "random", "DATA.NAME", "train_sbert",
        "MODEL.TEXTUAL.VOCAB_SIZE", 512,
    ])
    ds = PretrainingDatasetFactory.from_config(cfg, split="train")
    item = ds[0]
    assert int(np.max(item["input_ids"])) < 512

    with pytest.raises(ValueError):
        HashingTokenizer(vocab_size=64)


def test_seq_bucketing_trims_and_is_exact():
    """DATA.SEQ_BUCKETS: collate trims caption tensors to the smallest
    bucket holding the batch's longest caption, and the text tower's
    pooled output is exactly unchanged (padding is attention-masked)."""
    import jax

    from clip_lite_tpu.data.datasets import RandomDataset
    from clip_lite_tpu.data.pipeline import DataLoader
    from clip_lite_tpu.models.bert import BertModel

    ds = RandomDataset(length=32, image_size=32, mode="train_sbert",
                       max_caption_length=30, vocab_size=512,
                       seq_buckets=[12, 20])
    assert ds.seq_buckets == (12, 20, 30)  # top bucket auto-appended
    loader = DataLoader(ds, 8, shuffle=True, drop_last=True, num_workers=0,
                        seed=0, background=False, length_group_batches=4)
    batch = next(iter(loader))
    s = batch["input_ids"].shape[1]
    assert s in (12, 20, 30) and s < 30  # canned captions are ~12 tokens
    assert batch["attention_mask"].shape == batch["input_ids"].shape
    assert batch["image"].shape[0] == 8  # non-caption keys untouched

    # Exactness: same rows padded back to 30 give the same pooled output.
    model = BertModel(num_hidden_layers=1, vocab_size=512,
                      fused_attention=False)
    pad = 30 - s
    ids30 = np.pad(batch["input_ids"], ((0, 0), (0, pad)))
    mask30 = np.pad(batch["attention_mask"], ((0, 0), (0, pad)))
    v = model.init(jax.random.PRNGKey(0), ids30, mask30)
    _, pooled30 = model.apply(v, ids30, mask30, deterministic=True)
    _, pooled_s = model.apply(v, batch["input_ids"],
                              batch["attention_mask"], deterministic=True)
    np.testing.assert_allclose(np.asarray(pooled_s), np.asarray(pooled30),
                               rtol=1e-5, atol=1e-6)


def test_length_grouped_order_is_permutation_and_deterministic():
    from clip_lite_tpu.data.pipeline import DataLoader

    class _DS:
        def __len__(self):
            return 103

        def caption_max_token_lengths(self):
            return (np.arange(103) * 7919) % 29  # scrambled lengths

    dl1 = DataLoader(_DS(), 8, shuffle=True, num_workers=0, seed=3,
                     length_group_batches=2, background=False)
    dl2 = DataLoader(_DS(), 8, shuffle=True, num_workers=0, seed=3,
                     length_group_batches=2, background=False)
    dl1.set_epoch(5)
    dl2.set_epoch(5)
    o1, o2 = dl1._epoch_order(), dl2._epoch_order()
    np.testing.assert_array_equal(o1, o2)          # deterministic
    np.testing.assert_array_equal(np.sort(o1), np.arange(103))  # permutation
    # Batches are length-homogeneous vs plain shuffle: compare mean
    # in-batch length spread.
    lengths = _DS().caption_max_token_lengths()
    plain = DataLoader(_DS(), 8, shuffle=True, num_workers=0, seed=3,
                       background=False)
    plain.set_epoch(5)
    op = plain._epoch_order()

    def spread(order):
        b = order[:96].reshape(12, 8)
        return float(np.mean(np.ptp(lengths[b], axis=1)))

    assert spread(o1) < spread(op)
