"""Fused short-sequence attention (ops/attention.py) — interpret-mode
equivalence against the plain XLA formulation, VJP correctness, dropout
semantics, and the BertLayer integration toggle.

On CPU the kernel runs through the Pallas interpreter with an external
dropout mask; the TPU build swaps in the on-core PRNG (same masking and
scaling logic, different bit stream — the documented rbg-style trade)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_lite_tpu.ops.attention import (
    MASK_VALUE,
    _xla_attention,
    fused_short_attention,
)

B, S, NH, HD = 4, 30, 12, 64
H = NH * HD


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, S, 3 * H) * 0.3, jnp.float32)
    mask = np.ones((B, S), np.float32)
    mask[:, 25:] = 0.0  # padded tail
    bias = jnp.asarray((1 - mask) * MASK_VALUE, jnp.float32)
    return qkv, bias


def test_forward_matches_xla(inputs):
    qkv, bias = inputs
    ref = _xla_attention(qkv, bias, NH, 0.0, None)
    out = fused_short_attention(qkv, bias, NH, deterministic=True,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_padding_keys_ignored(inputs):
    """Changing values at masked key positions must not change the output
    at any query (the additive MASK_VALUE bias zeroes their probability)."""
    qkv, bias = inputs
    out1 = fused_short_attention(qkv, bias, NH, deterministic=True,
                                 interpret=True)
    poked = qkv.at[:, 25:, H:2 * H].add(7.0)  # keys of padded positions
    out2 = fused_short_attention(poked, bias, NH, deterministic=True,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out1[:, :25]),
                               np.asarray(out2[:, :25]),
                               rtol=1e-5, atol=1e-6)


def test_grad_matches_xla(inputs):
    qkv, bias = inputs

    def loss_fused(q):
        return jnp.sum(fused_short_attention(
            q, bias, NH, deterministic=True, interpret=True) ** 2)

    def loss_ref(q):
        return jnp.sum(_xla_attention(q, bias, NH, 0.0, None) ** 2)

    g1 = jax.grad(loss_fused)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_dropout_deterministic_per_key(inputs):
    qkv, bias = inputs
    k = jax.random.PRNGKey(3)
    o1 = fused_short_attention(qkv, bias, NH, dropout_rate=0.5,
                               dropout_rng=k, deterministic=False,
                               interpret=True)
    o2 = fused_short_attention(qkv, bias, NH, dropout_rate=0.5,
                               dropout_rng=k, deterministic=False,
                               interpret=True)
    assert np.array_equal(np.asarray(o1), np.asarray(o2))
    o3 = fused_short_attention(qkv, bias, NH, dropout_rate=0.5,
                               dropout_rng=jax.random.PRNGKey(4),
                               deterministic=False, interpret=True)
    assert not np.array_equal(np.asarray(o1), np.asarray(o3))


def test_dropout_grad_consistent_with_forward(inputs):
    """The backward recompute must reproduce the forward's dropout mask:
    finite-difference the loss along a random direction and compare."""
    qkv, bias = inputs
    k = jax.random.PRNGKey(7)

    def loss(q):
        return jnp.sum(fused_short_attention(
            q, bias, NH, dropout_rate=0.3, dropout_rng=k,
            deterministic=False, interpret=True) ** 2)

    g = jax.grad(loss)(qkv)
    d = jnp.asarray(np.random.RandomState(1).randn(*qkv.shape), jnp.float32)
    eps = 1e-3
    fd = (loss(qkv + eps * d) - loss(qkv - eps * d)) / (2 * eps)
    analytic = jnp.vdot(g, d)
    np.testing.assert_allclose(float(fd), float(analytic), rtol=2e-2)


def test_dropout_rate_realized(inputs):
    """With rate p, ~p of attention probabilities are zeroed: estimate via
    the mean over many draws ~ the deterministic output (unbiased)."""
    qkv, bias = inputs
    det = fused_short_attention(qkv, bias, NH, deterministic=True,
                                interpret=True)
    acc = 0
    n = 24
    for i in range(n):
        acc = acc + fused_short_attention(
            qkv, bias, NH, dropout_rate=0.25,
            dropout_rng=jax.random.PRNGKey(100 + i), deterministic=False,
            interpret=True)
    mean = np.asarray(acc) / n
    # Unbiasedness: E[dropout(probs)] = probs => means agree loosely.
    corr = np.corrcoef(mean.ravel(), np.asarray(det).ravel())[0, 1]
    assert corr > 0.98


def test_odd_batch_falls_back(inputs):
    qkv, bias = inputs
    q3 = qkv[:3]
    out = fused_short_attention(q3, bias[:3], NH, deterministic=True,
                                interpret=True)
    ref = _xla_attention(q3, bias[:3], NH, 0.0, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bert_layer_toggle_equivalence():
    """BertModel(fused_attention=True) must match the unfused model in
    eval mode (identical params, interpret-mode kernel on CPU)."""
    from clip_lite_tpu.models.bert import BertModel

    rng = np.random.RandomState(0)
    ids = np.asarray(rng.randint(0, 30522, (2, 30)), np.int32)
    am = np.ones((2, 30), np.int32)
    am[:, 20:] = 0
    plain = BertModel(num_hidden_layers=2, fused_attention=False,
                      add_pooler=False)
    fused = BertModel(num_hidden_layers=2, fused_attention=True,
                      add_pooler=False)
    v = plain.init(jax.random.PRNGKey(0), ids, am)
    seq1, _ = plain.apply(v, ids, am, deterministic=True)
    seq2, _ = fused.apply(v, ids, am, deterministic=True)
    np.testing.assert_allclose(np.asarray(seq1), np.asarray(seq2),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("s,nh,hd,b", [
    (12, 12, 64, 4),   # SEQ_BUCKETS short bucket
    (20, 12, 64, 4),   # SEQ_BUCKETS mid bucket
    (30, 8, 32, 6),    # smaller heads (bert_2layers-style ablations)
    (64, 4, 128, 2),   # wide heads, longer sequence
])
def test_fused_attention_shapes(s, nh, hd, b):
    """The kernel must stay exact across the shapes the framework feeds
    it: sequence buckets, head-count ablations, wide heads."""
    h = nh * hd
    rng = np.random.RandomState(1)
    qkv = jnp.asarray(rng.randn(b, s, 3 * h) * 0.3, jnp.float32)
    mask = np.ones((b, s), np.float32)
    mask[:, max(1, s - 3):] = 0.0
    bias = jnp.asarray((1 - mask) * MASK_VALUE, jnp.float32)
    ref = _xla_attention(qkv, bias, nh, 0.0, None)
    out = fused_short_attention(qkv, bias, nh, deterministic=True,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda q: jnp.sum(fused_short_attention(
        q, bias, nh, deterministic=True, interpret=True) ** 2))(qkv)
    g2 = jax.grad(lambda q: jnp.sum(
        _xla_attention(q, bias, nh, 0.0, None) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Full (B, NH, S, S) per-head bias (MPNet relative position bias support).
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def full_bias_inputs():
    rng = np.random.RandomState(2)
    qkv = jnp.asarray(rng.randn(B, S, 3 * H) * 0.3, jnp.float32)
    mask = np.ones((B, S), np.float32)
    mask[:, 25:] = 0.0
    pad = (1 - mask)[:, None, None, :] * MASK_VALUE
    rel = rng.randn(1, NH, S, S).astype(np.float32) * 0.5
    bias = jnp.asarray(rel + pad, jnp.float32)
    return qkv, bias


def test_full_bias_forward_matches_xla(full_bias_inputs):
    qkv, bias = full_bias_inputs
    ref = _xla_attention(qkv, bias, NH, 0.0, None)
    out = fused_short_attention(qkv, bias, NH, deterministic=True,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_full_bias_grads_match_xla(full_bias_inputs):
    """Both dqkv AND dbias must match — a full bias is a learned input
    (MPNet's relative attention table receives this gradient)."""
    qkv, bias = full_bias_inputs

    def loss_fused(q, b_):
        return jnp.sum(fused_short_attention(
            q, b_, NH, deterministic=True, interpret=True) ** 2)

    def loss_ref(q, b_):
        return jnp.sum(_xla_attention(q, b_, NH, 0.0, None) ** 2)

    g1q, g1b = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
    g2q, g2b = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(g1q), np.asarray(g2q),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1b), np.asarray(g2b),
                               rtol=1e-4, atol=1e-4)


def test_full_bias_dropout_grad_consistent(full_bias_inputs):
    """With dropout active, fwd and bwd must see the same keep mask:
    the directional derivative from the VJP must match a finite
    difference of the (fixed-seed) forward."""
    qkv, bias = full_bias_inputs
    k = jax.random.PRNGKey(7)

    def f(q):
        return jnp.sum(fused_short_attention(
            q, bias, NH, dropout_rate=0.3, dropout_rng=k,
            deterministic=False, interpret=True) ** 2)

    g = jax.grad(f)(qkv)
    d = jnp.asarray(np.random.RandomState(3).randn(*qkv.shape),
                    jnp.float32) * 1e-3
    fd = f(qkv + d) - f(qkv - d)
    np.testing.assert_allclose(float(jnp.vdot(g, d)) * 2, float(fd),
                               rtol=2e-2)


def test_mpnet_fused_toggle_equivalence():
    """MPNetModel(fused_attention=true) must match the unfused model in
    eval mode with identical params."""
    from clip_lite_tpu.models.mpnet import MPNetModel

    rng = np.random.RandomState(0)
    ids = np.asarray(rng.randint(2, 1000, (2, 30)), np.int32)
    am = np.ones((2, 30), np.int32)
    am[:, 20:] = 0
    ids[:, 20:] = 1  # pad token
    plain = MPNetModel(vocab_size=1000, num_hidden_layers=2,
                       fused_attention="false")
    fused = MPNetModel(vocab_size=1000, num_hidden_layers=2,
                       fused_attention="true")
    v = plain.init(jax.random.PRNGKey(0), ids, am)
    seq1, _ = plain.apply(v, ids, am, deterministic=True)
    seq2, _ = fused.apply(v, ids, am, deterministic=True)
    np.testing.assert_allclose(np.asarray(seq1), np.asarray(seq2),
                               rtol=2e-5, atol=2e-5)


def test_mpnet_fused_rel_bias_gradient():
    """The relative-attention-bias table must receive the same gradient
    through the fused kernel as through the XLA path."""
    from clip_lite_tpu.models.mpnet import MPNetModel

    rng = np.random.RandomState(1)
    ids = np.asarray(rng.randint(2, 500, (2, 16)), np.int32)
    am = np.ones((2, 16), np.int32)

    def loss(v, model):
        seq, _ = model.apply(v, ids, am, deterministic=True)
        return jnp.sum(seq ** 2)

    plain = MPNetModel(vocab_size=500, num_hidden_layers=1,
                       fused_attention="false")
    fused = MPNetModel(vocab_size=500, num_hidden_layers=1,
                       fused_attention="true")
    v = plain.init(jax.random.PRNGKey(0), ids, am)
    g1 = jax.grad(loss)(v, plain)
    g2 = jax.grad(loss)(v, fused)
    t1 = g1["params"]["relative_attention_bias"]["embedding"]
    t2 = g2["params"]["relative_attention_bias"]["embedding"]
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                               rtol=1e-3, atol=1e-3)


def test_fused_attention_config_plumbing():
    """MODEL.TEXTUAL.FUSED_ATTENTION round-trips from config (CLI string
    and YAML bool forms) into the text tower module tree."""
    from clip_lite_tpu.config import Config
    from clip_lite_tpu.factories import TextualHeadFactory

    cfg = Config(override_list=[
        "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 1,
        "MODEL.TEXTUAL.FUSED_ATTENTION", "false"])
    enc = TextualHeadFactory.from_config(cfg)
    assert enc.fused_attention == "false"

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "c.yaml")
        with open(p, "w") as f:
            f.write("MODEL:\n  TEXTUAL:\n    FUSED_ATTENTION: false\n")
        cfg2 = Config(p)
    assert cfg2.MODEL.TEXTUAL.FUSED_ATTENTION == "false"
    cfg3 = Config()
    assert cfg3.MODEL.TEXTUAL.FUSED_ATTENTION == "auto"

    from clip_lite_tpu.ops.attention import resolve_fused_flag
    assert resolve_fused_flag("false") is False
    assert resolve_fused_flag("true") is True
    assert resolve_fused_flag(False) is False
    assert resolve_fused_flag("auto") == (jax.default_backend() == "tpu")
