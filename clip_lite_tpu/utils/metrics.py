"""Evaluation metrics: Top-k accuracy accumulator, CIDEr-D, and SPICE.

Equivalents of the reference's utils/metrics.py: TopkAccuracy (:20-73),
the pure-python CIDEr scorer (:181-268), and SPICE via the official Java
scorer as a gated subprocess (reference :271-310) — it runs when a JVM +
the spice-1.0.jar (env CLIP_LITE_SPICE_JAR) are present and reports
``"SPICE": None`` otherwise, keeping the evaluator's two-key return
contract machine-readable in every environment.  Tokenization is a
lightweight PTB-ish normalizer instead of the reference's CoreNLP Java
subprocess (:129-178).
"""

from __future__ import annotations

import math
import os
import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence

import numpy as np


class TopkAccuracy:
    """Streaming top-k accuracy over (logits, labels) batches."""

    def __init__(self, top_k: int = 1):
        self.top_k = top_k
        self.reset()

    def reset(self):
        self.num_correct = 0
        self.num_total = 0

    def __call__(self, predictions: np.ndarray, labels: np.ndarray) -> None:
        predictions = np.asarray(predictions)
        labels = np.asarray(labels)
        if self.top_k == 1:
            top = predictions.argmax(-1)[..., None]
        else:
            top = np.argpartition(-predictions, self.top_k - 1,
                                  axis=-1)[..., : self.top_k]
        correct = (top == labels[..., None]).any(-1)
        self.num_correct += int(correct.sum())
        self.num_total += int(correct.size)

    def get_metric(self, reset: bool = False) -> float:
        value = 100.0 * self.num_correct / max(1, self.num_total)
        if reset:
            self.reset()
        return value


_PUNCT = re.compile(r"[^\w\s]")


def ptb_tokenize(caption: str) -> List[str]:
    """Lowercase, strip punctuation, split — the lightweight stand-in for
    the reference's CoreNLP PTBTokenizer subprocess."""
    return _PUNCT.sub("", caption.lower()).split()


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i: i + n]) for i in range(len(tokens) - n + 1))


class CiderScorer:
    """CIDEr-D: tf-idf weighted n-gram cosine similarity with length
    penalty (Vedantam et al. 2015), n = 1..4, sigma = 6."""

    def __init__(self, n: int = 4, sigma: float = 6.0):
        self.n = n
        self.sigma = sigma

    def compute_score(self, ground_truth: Dict[str, List[str]],
                      predictions: Dict[str, List[str]]) -> float:
        """ground_truth/predictions: id -> list of captions (predictions
        have one). Returns mean CIDEr-D x 100 (reference scales by 100 in
        reporting)."""
        ids = list(predictions.keys())
        # Document frequencies over reference sets.
        doc_freq = [defaultdict(int) for _ in range(self.n)]
        gt_ngrams = {}
        for img_id in ids:
            per_ref = [
                [_ngrams(ptb_tokenize(ref), k + 1) for k in range(self.n)]
                for ref in ground_truth[img_id]
            ]
            gt_ngrams[img_id] = per_ref
            for k in range(self.n):
                seen = set()
                for ref in per_ref:
                    seen |= set(ref[k].keys())
                for g in seen:
                    doc_freq[k][g] += 1
        log_num_images = math.log(max(1, len(ids)))

        def tfidf_vec(counts_per_n, length):
            vecs, norms = [], []
            for k in range(self.n):
                vec = {}
                norm = 0.0
                for g, cnt in counts_per_n[k].items():
                    df = math.log(max(1.0, doc_freq[k][g]))
                    w = cnt * (log_num_images - df)
                    vec[g] = w
                    norm += w * w
                vecs.append(vec)
                norms.append(math.sqrt(norm))
            return vecs, norms

        scores = []
        for img_id in ids:
            cand_tokens = ptb_tokenize(predictions[img_id][0])
            cand_counts = [_ngrams(cand_tokens, k + 1) for k in range(self.n)]
            cand_vec, cand_norm = tfidf_vec(cand_counts, len(cand_tokens))

            img_score = np.zeros(self.n)
            for ref_counts in gt_ngrams[img_id]:
                ref_vec, ref_norm = tfidf_vec(ref_counts, None)
                ref_len = sum(ref_counts[0].values())
                delta = len(cand_tokens) - ref_len
                for k in range(self.n):
                    # CIDEr-D: clipped candidate counts in the dot product.
                    num = 0.0
                    for g, w in cand_vec[k].items():
                        if g in ref_vec[k]:
                            num += min(w, ref_vec[k][g]) * ref_vec[k][g]
                    if cand_norm[k] and ref_norm[k]:
                        sim = num / (cand_norm[k] * ref_norm[k])
                    else:
                        sim = 0.0
                    sim *= math.exp(-(delta ** 2) / (2 * self.sigma ** 2))
                    img_score[k] += sim
            img_score /= max(1, len(gt_ngrams[img_id]))
            scores.append(10.0 * img_score.mean())  # CIDEr-D convention
        return 100.0 * float(np.mean(scores)) / 10.0


def spice_available(jar_path: str = None) -> bool:
    """Whether the SPICE scorer can run here: a JVM on PATH plus the
    SPICE jar (point ``CLIP_LITE_SPICE_JAR`` at spice-1.0.jar)."""
    import shutil

    jar = jar_path or os.environ.get("CLIP_LITE_SPICE_JAR", "")
    return bool(shutil.which("java")) and os.path.isfile(jar)


def spice_score(predictions: Dict[str, List[str]],
                ground_truth: Dict[str, List[str]],
                jar_path: str = None) -> float:
    """SPICE via the official Java scorer as a subprocess
    (reference: utils/metrics.py:271-310).  Requires a JVM and the jar
    (CLIP_LITE_SPICE_JAR); call :func:`spice_available` first — this
    raises RuntimeError when the toolchain is missing.
    """
    import json
    import subprocess
    import tempfile

    jar = jar_path or os.environ.get("CLIP_LITE_SPICE_JAR", "")
    if not spice_available(jar):
        raise RuntimeError(
            "SPICE needs a JVM and CLIP_LITE_SPICE_JAR=<spice-1.0.jar>")
    records = [{"image_id": k, "test": predictions[k][0],
                "refs": list(ground_truth[k])} for k in ground_truth]
    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "in.json")
        outp = os.path.join(tmp, "out.json")
        cache = os.path.join(tmp, "cache")
        os.makedirs(cache, exist_ok=True)
        with open(inp, "w") as f:
            json.dump(records, f)
        subprocess.check_call(
            ["java", "-jar", "-Xmx8G", jar, inp, "-cache", cache,
             "-out", outp, "-subset", "-silent"])
        with open(outp) as f:
            results = json.load(f)
    return float(np.mean([float(item["scores"]["All"]["f"])
                          for item in results]))


class CocoCaptionsEvaluator:
    """Caption evaluation harness (reference: utils/metrics.py:76-126).

    Returns ``{"CIDEr": float, "SPICE": float | None, "tokenizer":
    "builtin-ptb-approx"}`` — the reference contract computes both
    scores; SPICE needs the Java toolchain (:func:`spice_available`),
    and when it is absent the key is reported as ``None``
    (machine-readable "not computed") rather than dropped, so downstream
    result parsing keeps working either way.

    CAVEAT, flagged to callers via the ``"tokenizer"`` key: candidate and
    reference captions are tokenized with :func:`ptb_tokenize`, a
    lightweight approximation of the Stanford CoreNLP PTBTokenizer the
    reference shells out to (reference: utils/metrics.py:129-178).  The
    two tokenizers differ on contractions, hyphenation and punctuation
    edge cases, so scores are NOT decimal-comparable to published
    CoreNLP-tokenized numbers — compare only scores produced by the same
    evaluator.
    """

    def __init__(self, ground_truth: Dict[str, List[str]],
                 spice_jar: str = None):
        self.ground_truth = {str(k): list(v) for k, v in ground_truth.items()}
        self.spice_jar = spice_jar

    def evaluate(self, preds: List[dict]) -> Dict[str, float]:
        """preds: [{"image_id": ..., "caption": str}, ...]"""
        predictions = {str(p["image_id"]): [p["caption"]] for p in preds}
        gt = {k: self.ground_truth[k] for k in predictions}
        cider = CiderScorer().compute_score(gt, predictions)
        spice = (100.0 * spice_score(predictions, gt, self.spice_jar)
                 if spice_available(self.spice_jar) else None)
        return {"CIDEr": cider, "SPICE": spice,
                "tokenizer": "builtin-ptb-approx"}
