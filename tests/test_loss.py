"""JSD InfoMax loss tests.

Golden values come from an independent NumPy re-derivation of the math
(softplus/JSD/critic), NOT from running the reference code — this checks
the Flax modules implement the published objective, layer by layer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_lite_tpu.ops.loss import (
    GlobalDiscriminator,
    GlobalDiscriminatorDot,
    JSDInfoMaxLoss,
    MILinearBlock,
    PriorDiscriminator,
)

# Always-run smoke gate: pure math, single device, no mesh (pytest -m smoke).
pytestmark = pytest.mark.smoke


def softplus(x):
    return np.logaddexp(0.0, x)


def np_linear(x, p):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def np_mi_linear_block(x, p, train=True):
    h = x @ p["nonlinear_fc1"]["kernel"]
    bn = p["nonlinear_bn"]["BatchNorm_0"]
    if train:
        mu = h.mean(0)
        var = h.var(0)  # biased, matching torch train-mode normalization
    else:
        mu, var = np.zeros(h.shape[1]), np.ones(h.shape[1])
    h = (h - mu) / np.sqrt(var + 1e-5) * bn["scale"] + bn["bias"]
    h = np.maximum(h, 0)
    h = np_linear(h, p["nonlinear_fc2"])
    s = np_linear(x, p["shortcut"])
    f = h + s
    ln = p["block_ln"]["LayerNorm_0"]
    mu = f.mean(-1, keepdims=True)
    var = f.var(-1, keepdims=True)
    f = (f - mu) / np.sqrt(var + 1e-5) * ln["scale"] + ln["bias"]
    return f


def np_dot_critic(img, txt, p, train=True):
    f1 = np_mi_linear_block(img, p["img_block"], train)
    f2 = np_mi_linear_block(txt, p["text_block"], train)
    f1 = f1 / np.maximum(np.linalg.norm(f1, axis=-1, keepdims=True), 1e-12)
    f2 = f2 / np.maximum(np.linalg.norm(f2, axis=-1, keepdims=True), 1e-12)
    return (f1 * f2).sum(-1) * np.exp(p["temperature"])


def to_np(tree):
    return jax.tree.map(lambda x: np.asarray(x, np.float64), tree)


@pytest.fixture(scope="module")
def feats():
    rng = np.random.RandomState(7)
    img = rng.randn(16, 64).astype(np.float32)
    txt = rng.randn(16, 48).astype(np.float32)
    return img, txt


def test_mi_linear_block_shortcut_init():
    """Shortcut kernel: exact-1 diagonal, U(-0.01, 0.01) elsewhere
    (reference loss.py:26-32)."""
    m = MILinearBlock(units=128)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((4, 64)), train=False)
    k = np.asarray(params["params"]["shortcut"]["kernel"])
    assert k.shape == (64, 128)
    assert np.allclose(np.diag(k[:, :64]), 1.0)
    off = k.copy()
    np.fill_diagonal(off[:, :64], 0.0)
    assert np.abs(off).max() <= 0.01


def test_mi_linear_block_matches_numpy(feats):
    img, _ = feats
    m = MILinearBlock(units=96)
    variables = m.init(jax.random.PRNGKey(1), jnp.asarray(img), train=False)
    out, _ = m.apply(variables, jnp.asarray(img), train=True,
                     mutable=["batch_stats"])
    expected = np_mi_linear_block(img.astype(np.float64),
                                  to_np(variables["params"]))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_prior_discriminator_matches_numpy(feats):
    img, _ = feats
    m = PriorDiscriminator()
    variables = m.init(jax.random.PRNGKey(2), jnp.asarray(img))
    out = m.apply(variables, jnp.asarray(img))
    p = to_np(variables["params"])
    h = np.maximum(np_linear(img.astype(np.float64), p["l0"]), 0)
    h = np.maximum(np_linear(h, p["l1"]), 0)
    expected = 1.0 / (1.0 + np.exp(-np_linear(h, p["l2"])))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_dot_critic_matches_numpy(feats):
    img, txt = feats
    m = GlobalDiscriminatorDot(units=96)
    variables = m.init(jax.random.PRNGKey(3), jnp.asarray(img),
                       jnp.asarray(txt), train=False)
    out, _ = m.apply(variables, jnp.asarray(img), jnp.asarray(txt),
                     train=True, mutable=["batch_stats"])
    expected = np_dot_critic(img.astype(np.float64), txt.astype(np.float64),
                             to_np(variables["params"]))
    assert out.shape == (16,)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_concat_critic_shape(feats):
    img, txt = feats
    m = GlobalDiscriminator()
    variables = m.init(jax.random.PRNGKey(4), jnp.asarray(img), jnp.asarray(txt))
    out = m.apply(variables, jnp.asarray(img), jnp.asarray(txt))
    assert out.shape == (16,)


def test_jsd_cross_modal_matches_numpy(feats):
    """Full cross-modal JSD term vs NumPy: Em - Ej with roll-by-one
    negatives (reference loss.py:204-254)."""
    img, txt = feats
    loss = JSDInfoMaxLoss(image_dim=64, text_dim=48, image_prior=False,
                          text_prior=False)
    variables = loss.init(
        {"params": jax.random.PRNGKey(5)},
        jnp.asarray(img), jnp.asarray(txt), train=False)
    out, _ = loss.apply(variables, jnp.asarray(img), jnp.asarray(txt),
                        train=True, mutable=["batch_stats"])

    p = to_np(variables["params"]["global_d"])
    img64, txt64 = img.astype(np.float64), txt.astype(np.float64)
    ej = -softplus(-np_dot_critic(img64, txt64, p)).mean()
    txt_prime = np.concatenate([txt64[1:], txt64[:1]], axis=0)
    em = softplus(np_dot_critic(img64, txt_prime, p)).mean()
    expected = em - ej

    np.testing.assert_allclose(
        float(out["cross_modal_loss"]), expected, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        float(out["total_loss"]), 0.9 * expected, rtol=1e-4, atol=1e-5)
    assert float(out["visual_loss"]) == 0.0
    assert float(out["textual_loss"]) == 0.0


def test_jsd_with_priors_structure(feats):
    """total = 0.9*jsd + 0.1*prior; prior terms positive (-log sigmoid)."""
    img, txt = feats
    loss = JSDInfoMaxLoss(image_dim=64, text_dim=48, image_prior=True,
                          text_prior=True)
    variables = loss.init(
        {"params": jax.random.PRNGKey(6), "prior": jax.random.PRNGKey(7)},
        jnp.asarray(img), jnp.asarray(txt), train=False)
    out, _ = loss.apply(variables, jnp.asarray(img), jnp.asarray(txt),
                        train=True, mutable=["batch_stats"],
                        rngs={"prior": jax.random.PRNGKey(8)})
    prior = (float(out["total_loss"]) -
             0.9 * float(out["cross_modal_loss"])) / 0.1
    assert prior > 0.0  # -(log d(noise) + log(1 - d(real))) > 0 always


def test_ssl_terms(feats):
    img, txt = feats
    loss = JSDInfoMaxLoss(image_dim=64, text_dim=48, image_prior=False,
                          text_prior=False, visual_self_supervised=True,
                          textual_self_supervised=True)
    aug_img = img + 0.1
    aug_txt = txt + 0.1
    variables = loss.init(
        {"params": jax.random.PRNGKey(9)},
        jnp.asarray(img), jnp.asarray(txt),
        aug_image_features=jnp.asarray(aug_img),
        aug_text_features=jnp.asarray(aug_txt), train=False)
    out, _ = loss.apply(
        variables, jnp.asarray(img), jnp.asarray(txt),
        aug_image_features=jnp.asarray(aug_img),
        aug_text_features=jnp.asarray(aug_txt),
        train=True, mutable=["batch_stats"])
    assert float(out["visual_loss"]) != 0.0
    assert float(out["textual_loss"]) != 0.0
    np.testing.assert_allclose(
        float(out["total_loss"]),
        0.9 * (float(out["cross_modal_loss"]) + float(out["visual_loss"])
               + float(out["textual_loss"])), rtol=1e-5)


def test_cluster_mode(feats):
    """Hard-negative cluster mode doubles the effective batch
    (reference loss.py:225-252)."""
    img, txt = feats
    loss = JSDInfoMaxLoss(image_dim=64, text_dim=48, image_prior=False,
                          text_prior=False)
    variables = loss.init(
        {"params": jax.random.PRNGKey(10)},
        jnp.asarray(img), jnp.asarray(txt), train=False)
    out, _ = loss.apply(
        variables, jnp.asarray(img), jnp.asarray(txt),
        neg_image_features=jnp.asarray(img[::-1].copy()),
        neg_text_features=jnp.asarray(txt[::-1].copy()),
        train=True, mutable=["batch_stats"])
    assert np.isfinite(float(out["total_loss"]))


def test_all_critic_types(feats):
    img, txt = feats
    for ctype in ["dot", "concat", "dotcon", "condot"]:
        loss = JSDInfoMaxLoss(image_dim=64, text_dim=48, image_prior=False,
                              text_prior=False, critic_type=ctype,
                              visual_self_supervised=True)
        variables = loss.init(
            {"params": jax.random.PRNGKey(11)},
            jnp.asarray(img), jnp.asarray(txt),
            aug_image_features=jnp.asarray(img), train=False)
        out, _ = loss.apply(
            variables, jnp.asarray(img), jnp.asarray(txt),
            aug_image_features=jnp.asarray(img),
            train=True, mutable=["batch_stats"])
        assert np.isfinite(float(out["total_loss"])), ctype


def test_projection_api(feats):
    """Downstream evals reach into the critic's projection blocks
    (reference retrieval.py:71-74) — exercise the exposed method."""
    img, txt = feats
    loss = JSDInfoMaxLoss(image_dim=64, text_dim=48, image_prior=False,
                          text_prior=False)
    variables = loss.init(
        {"params": jax.random.PRNGKey(12)},
        jnp.asarray(img), jnp.asarray(txt), train=False)
    proj = loss.apply(variables, jnp.asarray(img), method=loss.project_image)
    assert proj.shape == (16, 2048)
