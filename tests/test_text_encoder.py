"""TextEncoder mode tests + MPNet parity vs HF torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_lite_tpu.models.text_encoder import TextEncoder

pytestmark = pytest.mark.slow  # compile/parity heavy; fast loop: -m 'not slow'


torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_sbert_passthrough():
    enc = TextEncoder(mode="sbert")
    batch = {"caption_encodings": jnp.ones((4, 768))}
    v = enc.init(jax.random.PRNGKey(0), batch, train=False)
    out = enc.apply(v, batch, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.ones((4, 768)))
    assert enc.feature_size == 768


def test_sbert_transform_mlp():
    enc = TextEncoder(mode="sbert", transform_embedding=True, txt_enc_dim=256)
    batch = {"caption_encodings": jnp.ones((4, 768))}
    v = enc.init(jax.random.PRNGKey(0), batch, train=False)
    out = enc.apply(v, batch, train=False)
    assert out.shape == (4, 256)


def test_glove_mean_pool_and_frozen():
    enc = TextEncoder(mode="glove", glove_vocab_size=50, glove_dim=16,
                      train_embeddings=False)
    batch = {"caption_tokens": jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]])}
    v = enc.init(jax.random.PRNGKey(0), batch, train=False)
    out = enc.apply(v, batch, train=False)
    assert out.shape == (2, 16)
    # mean over token axis
    table = np.asarray(v["params"]["embedding"]["embedding"])
    expected = table[np.asarray(batch["caption_tokens"])].mean(1)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)
    # frozen embeddings: zero grads
    grads = jax.grad(
        lambda p: (enc.apply({"params": p}, batch, train=True) ** 2).sum()
    )(v["params"])
    assert np.allclose(np.asarray(grads["embedding"]["embedding"]), 0)


def test_train_sbert_bert_pooler_path():
    enc = TextEncoder(mode="train_sbert", model_name="bert-base-uncased",
                      num_hidden_layers=1, vocab_size=128)
    batch = {"input_ids": jnp.ones((2, 8), jnp.int32),
             "attention_mask": jnp.ones((2, 8), jnp.int32)}
    v = enc.init(jax.random.PRNGKey(0), batch, train=False)
    out = enc.apply(v, batch, train=False)
    assert out.shape == (2, 768)


def test_mpnet_parity_vs_hf():
    """Our MPNet (mean-pooled path) vs HF torch MPNetModel, random weights."""
    from clip_lite_tpu.models.mpnet import MPNetModel, import_hf_mpnet_state_dict

    cfg = transformers.MPNetConfig(
        vocab_size=64, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=32, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.MPNetModel(cfg).eval()

    model = MPNetModel(vocab_size=64, hidden_size=48, num_hidden_layers=2,
                       num_heads=4, intermediate_size=96, max_position=32,
                       dropout_rate=0.0)
    variables = import_hf_mpnet_state_dict(hf.state_dict(), num_layers=2)

    rng = np.random.RandomState(0)
    ids = rng.randint(3, 64, (2, 10)).astype(np.int64)
    lengths = [10, 6]
    mask = (np.arange(10)[None, :] < np.asarray(lengths)[:, None]).astype(np.int64)
    ids = ids * mask + 1 * (1 - mask)  # pad token is 1

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
    seq, _ = model.apply(variables, jnp.asarray(ids), jnp.asarray(mask))

    ref_seq = ref.last_hidden_state.numpy()
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(seq)[m], ref_seq[m],
                               rtol=3e-4, atol=1e-4)


def test_unknown_mode_rejected():
    enc = TextEncoder(mode="nonsense")
    with pytest.raises(ValueError):
        enc.init(jax.random.PRNGKey(0), {"caption_encodings": jnp.ones((1, 768))},
                 train=False)
