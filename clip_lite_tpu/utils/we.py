"""Word/embedding debiasing utilities (Bolukbasi-style).

Equivalent of the reference's utils/we.py surface used by the bias tool
(reference: utils/we.py:290-304 doPCA/drop, bias_eda.py:131-137): estimate
a gender direction as the top principal component of differences between
definitional prompt pairs encoded by the text tower, and remove its
projection from embeddings.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np


def pca_components(matrix: np.ndarray, num_components: int = 10):
    """Principal components of a (N, D) matrix (top ``num_components``),
    via SVD on the centered data — no sklearn dependency."""
    x = matrix - matrix.mean(axis=0, keepdims=True)
    _, s, vt = np.linalg.svd(x, full_matrices=False)
    k = min(num_components, vt.shape[0])
    explained = (s ** 2) / max(1e-12, (s ** 2).sum())
    return vt[:k], explained[:k]


def do_pca(pairs: Sequence[Tuple[str, str]],
           encode_fn: Callable[[List[str]], np.ndarray],
           num_components: int = 10):
    """Gender-subspace PCA over definitional pairs
    (reference: utils/we.py:290-302).

    encode_fn maps a list of prompts to (N, D) embeddings.  For each pair
    (a, b), both members are centered on the pair mean; the principal
    directions of the residuals span the bias subspace.
    """
    flat: List[str] = [p for pair in pairs for p in pair]
    vecs = np.asarray(encode_fn(flat), np.float64)
    rows = []
    for i in range(0, len(flat), 2):
        a, b = vecs[i], vecs[i + 1]
        center = (a + b) / 2
        rows.append(a - center)
        rows.append(b - center)
    components, explained = pca_components(np.asarray(rows), num_components)
    return components, explained


def drop(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Remove the projection of u onto direction v
    (reference: utils/we.py:304)."""
    u = np.asarray(u, np.float64)
    v = np.asarray(v, np.float64)
    return u - v * (u @ v) / (v @ v)


def gender_direction(pairs, encode_fn) -> np.ndarray:
    """Top bias component from definitional pairs."""
    components, _ = do_pca(pairs, encode_fn)
    return components[0]


def debias(embeddings: np.ndarray, direction: np.ndarray) -> np.ndarray:
    """Drop the bias direction from a batch of embeddings
    (reference: bias_eda.py:131-137)."""
    embeddings = np.atleast_2d(np.asarray(embeddings, np.float64))
    proj = (embeddings @ direction)[:, None] * direction / (
        direction @ direction)
    return embeddings - proj


DEFAULT_DEFINITIONAL_PAIRS = [
    ["a photo of a woman", "a photo of a man"],
    ["a photo of a girl", "a photo of a boy"],
    ["a photo of a mother", "a photo of a father"],
    ["a photo of a daughter", "a photo of a son"],
    ["she is walking", "he is walking"],
    ["a female person", "a male person"],
]
