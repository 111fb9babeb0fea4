"""Debias utility tests: PCA gender direction, projection removal."""

import numpy as np

from clip_lite_tpu.utils import we


def test_drop_removes_projection():
    v = np.asarray([1.0, 0.0, 0.0])
    u = np.asarray([3.0, 2.0, 1.0])
    out = we.drop(u, v)
    np.testing.assert_allclose(out, [0.0, 2.0, 1.0])
    assert abs(out @ v) < 1e-12


def test_gender_direction_recovers_planted_axis():
    """Definitional pairs differing mainly along axis 0 must yield a
    direction aligned with axis 0."""
    rng = np.random.RandomState(0)
    d = 16

    def encode(prompts):
        out = []
        for p in prompts:
            base = rng.randn(d) * 0.05
            base[0] = 1.0 if ("woman" in p or "girl" in p or "she" in p
                              or "female" in p or "mother" in p
                              or "daughter" in p) else -1.0
            out.append(base)
        return np.asarray(out)

    direction = we.gender_direction(we.DEFAULT_DEFINITIONAL_PAIRS, encode)
    alignment = abs(direction[0]) / np.linalg.norm(direction)
    assert alignment > 0.95


def test_debias_batch():
    rng = np.random.RandomState(1)
    direction = np.zeros(8)
    direction[2] = 1.0
    emb = rng.randn(5, 8)
    out = we.debias(emb, direction)
    np.testing.assert_allclose(out[:, 2], 0.0, atol=1e-12)
    np.testing.assert_allclose(out[:, 0], emb[:, 0])


def test_pca_components_orthonormal():
    rng = np.random.RandomState(2)
    comps, explained = we.pca_components(rng.randn(20, 6), 3)
    assert comps.shape == (3, 6)
    np.testing.assert_allclose(comps @ comps.T, np.eye(3), atol=1e-10)
    assert explained[0] >= explained[1] >= explained[2]
