"""BERT tower parity tests against HF torch BertModel (random weights,
no network needed): sequence + pooled outputs must match to cosine>=0.999
(BASELINE.md parity target) and tight absolute tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_lite_tpu.models.bert import (
    BertModel,
    import_hf_bert_state_dict,
    masked_mean_pooling,
)

pytestmark = pytest.mark.slow  # compile/parity heavy; fast loop: -m 'not slow'

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_pair():
    """A tiny HF BertModel (random init, offline) + our Flax twin with
    imported weights."""
    cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.BertModel(cfg).eval()

    flax_model = BertModel(vocab_size=128, hidden_size=64,
                           num_hidden_layers=3, num_heads=4,
                           intermediate_size=128, max_position=64,
                           dropout_rate=0.0)
    variables = import_hf_bert_state_dict(hf.state_dict(), num_layers=3)
    return hf, flax_model, variables


def _rand_batch(seed=0, b=4, s=16, vocab=128):
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, vocab, (b, s)).astype(np.int64)
    lengths = rng.randint(3, s + 1, b)
    mask = (np.arange(s)[None, :] < lengths[:, None]).astype(np.int64)
    ids = ids * mask  # pad positions get token 0
    return ids, mask


def cosine(a, b):
    a, b = a.ravel(), b.ravel()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_pooler_output_parity(hf_pair):
    hf, flax_model, variables = hf_pair
    ids, mask = _rand_batch()
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask))
    seq, pooled = flax_model.apply(variables, jnp.asarray(ids),
                                   jnp.asarray(mask))
    ref_seq = ref.last_hidden_state.numpy()
    ref_pooled = ref.pooler_output.numpy()

    # Padding positions differ (HF still computes them through LN); compare
    # only real tokens for the sequence output.
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(seq)[m], ref_seq[m],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled,
                               rtol=2e-4, atol=2e-5)
    assert cosine(np.asarray(pooled), ref_pooled) >= 0.999


def test_full_size_bert_parity_single_layer():
    """768-wide single-layer BERT (the from-scratch NUM_HIDDEN_LAYERS knob,
    reference encoder.py:167-170) against HF at full hidden size."""
    cfg = transformers.BertConfig(num_hidden_layers=1, hidden_dropout_prob=0.0,
                                  attention_probs_dropout_prob=0.0)
    torch.manual_seed(1)
    hf = transformers.BertModel(cfg).eval()
    model = BertModel(num_hidden_layers=1, dropout_rate=0.0)
    variables = import_hf_bert_state_dict(hf.state_dict(), num_layers=1)

    ids, mask = _rand_batch(seed=3, b=2, s=30, vocab=30522)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
    _, pooled = model.apply(variables, jnp.asarray(ids), jnp.asarray(mask))
    assert cosine(np.asarray(pooled), ref.pooler_output.numpy()) >= 0.999
    np.testing.assert_allclose(np.asarray(pooled), ref.pooler_output.numpy(),
                               rtol=5e-4, atol=5e-5)


def test_masked_mean_pooling_matches_reference_formula(hf_pair):
    hf, flax_model, variables = hf_pair
    ids, mask = _rand_batch(seed=5)
    seq, _ = flax_model.apply(variables, jnp.asarray(ids), jnp.asarray(mask))
    ours = masked_mean_pooling(seq, jnp.asarray(mask))
    seq_np = np.asarray(seq)
    m = mask[..., None].astype(np.float64)
    expected = (seq_np * m).sum(1) / np.maximum(m.sum(1), 1e-9)
    np.testing.assert_allclose(np.asarray(ours), expected, rtol=1e-5, atol=1e-6)


def test_dropout_active_in_training():
    model = BertModel(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                      num_heads=2, intermediate_size=64, dropout_rate=0.5)
    ids = jnp.ones((2, 8), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), ids)
    s1, _ = model.apply(v, ids, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    s2, _ = model.apply(v, ids, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(s1), np.asarray(s2))
    d1, _ = model.apply(v, ids, deterministic=True)
    d2, _ = model.apply(v, ids, deterministic=True)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
