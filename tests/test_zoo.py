"""Model zoo tests: every model_dict entry builds and runs; shapes and
feature sizes match the published architectures."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_lite_tpu.models import zoo

pytestmark = pytest.mark.slow  # compile/parity heavy; fast loop: -m 'not slow'


BACKBONES = [
    ("resnet8", 64), ("resnet20", 64), ("resnet110", 64),
    ("resnet8x4", 256), ("resnet32x4", 256),
    ("ResNet50", 2048),
    ("wrn_16_1", 64), ("wrn_40_2", 128),
    ("vgg8", 512), ("vgg19", 512),
    ("MobileNetV2", 1280),
    ("ShuffleV1", 800), ("ShuffleV2", 1024),
]


@pytest.mark.parametrize("name,feat", BACKBONES)
def test_backbone_builds_and_runs(name, feat):
    model = zoo.model_dict[name](num_classes=100)
    x = jnp.zeros((2, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(v, x, train=False)
    assert logits.shape == (2, 100)
    assert model.feature_size == feat


def test_return_features():
    model = zoo.model_dict["resnet20"](num_classes=100)
    x = jnp.zeros((2, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    feats, logits = model.apply(v, x, train=False, return_features=True)
    assert logits.shape == (2, 100)
    assert len(feats) == 5  # stem + 3 stages + pooled
    assert feats[-1].shape == (2, 64)
    # spatial resolutions halve per stage: 32, 32, 16, 8
    assert feats[0].shape[1] == 32
    assert feats[3].shape[1] == 8


def test_cifar_resnet_depth_counts():
    """depth = 6n+2: resnet20 has 3 stages x 3 blocks."""
    model = zoo.model_dict["resnet20"](num_classes=10)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    layers = [k for k in v["params"] if k.startswith("layer")]
    assert len(layers) == 9


def test_classifier_heads():
    for name in ["LinearClassifier", "NonLinearClassifier"]:
        m = zoo.model_dict[name](num_classes=10)
        x = jnp.zeros((2, 64))
        v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == (2, 10)
    for name in ["Conv4", "Conv4MP"]:
        m = zoo.model_dict[name](num_classes=10)
        x = jnp.zeros((2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == (2, 10)


def test_distillation_embeds():
    x = jnp.ones((2, 8, 8, 16))
    for cls in [zoo.Embed, zoo.LinearEmbed, zoo.MLPEmbed]:
        m = cls(dim_out=32)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (2, 32)
    m = zoo.Embed(dim_out=32)
    v = m.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(m.apply(v, x)), axis=1), 1.0, rtol=1e-5)


def test_conv_reg():
    m = zoo.ConvReg(out_channels=32)
    x = jnp.zeros((2, 8, 8, 16))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 8, 8, 32)


def test_zoo_backbones_registered_for_pretraining():
    """zoo::<name> works as a visual tower in the pretraining model."""
    from clip_lite_tpu.config import Config
    from clip_lite_tpu.factories import PretrainingModelFactory

    cfg = Config(override_list=[
        "MODEL.VISUAL.NETWORK_NAME", "zoo::resnet8",
        "MODEL.VISUAL.FEATURE_SIZE", 64,
        "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 1,
        "MODEL.TEXTUAL.VOCAB_SIZE", 64, "AMP", False,
    ])
    model = PretrainingModelFactory.from_config(cfg)
    batch = {"image": jnp.zeros((4, 32, 32, 3)),
             "input_ids": jnp.ones((4, 8), jnp.int32),
             "attention_mask": jnp.ones((4, 8), jnp.int32)}
    v = model.init({"params": jax.random.PRNGKey(0),
                    "prior": jax.random.PRNGKey(1),
                    "dropout": jax.random.PRNGKey(2)}, batch, train=False)
    out, _ = model.apply(v, batch, train=True, mutable=["batch_stats"],
                         rngs={"prior": jax.random.PRNGKey(3),
                               "dropout": jax.random.PRNGKey(4)})
    assert np.isfinite(float(out["loss"]))
