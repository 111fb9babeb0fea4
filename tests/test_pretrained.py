"""Pretrained-weight splicing: torch ResNet + HF BERT state_dicts into the
full model's variables."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_lite_tpu.config import Config
from clip_lite_tpu.factories import PretrainingModelFactory
from clip_lite_tpu.models.pretrained import apply_pretrained_weights

pytestmark = pytest.mark.slow  # compile/parity heavy; fast loop: -m 'not slow'


torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_apply_pretrained_both_towers(tmp_path):
    from clip_lite_tpu.models.resnet import (
        export_torch_resnet_state_dict,
        resnet18,
    )

    # Build a torch-format ResNet checkpoint from a known Flax model.
    donor = resnet18()
    dv = donor.init(jax.random.PRNGKey(42), jnp.zeros((1, 32, 32, 3)),
                    train=False)
    sd = export_torch_resnet_state_dict(dv, [2, 2, 2, 2])
    vis_path = str(tmp_path / "rn18.pt")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, vis_path)

    # HF BERT checkpoint (tiny-but-matching hidden sizes is not required;
    # use 1-layer full-width for speed).
    cfgb = transformers.BertConfig(num_hidden_layers=1)
    torch.manual_seed(0)
    hf = transformers.BertModel(cfgb)
    txt_path = str(tmp_path / "bert.pt")
    torch.save(hf.state_dict(), txt_path)

    cfg = Config(override_list=[
        "MODEL.VISUAL.NETWORK_NAME", "resnet18",
        "MODEL.VISUAL.FEATURE_SIZE", 512,
        "MODEL.VISUAL.PRETRAINED", True,
        "MODEL.VISUAL.PRETRAINED_PATH", vis_path,
        "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 1,
        "MODEL.TEXTUAL.PRETRAINED", True,
        "MODEL.TEXTUAL.PRETRAINED_PATH", txt_path,
        "AMP", False,
    ])
    model = PretrainingModelFactory.from_config(cfg)
    batch = {"image": jnp.zeros((2, 32, 32, 3)),
             "input_ids": jnp.ones((2, 8), jnp.int32),
             "attention_mask": jnp.ones((2, 8), jnp.int32)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "prior": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, batch, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    out = apply_pretrained_weights(variables, cfg)

    # Visual tower weights must equal the donor's.
    got = np.asarray(
        out["params"]["image_encoder"]["backbone"]["stem"]["conv"]["kernel"])
    want = np.asarray(dv["params"]["stem"]["conv"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # Text tower embeddings must equal HF's.
    got = np.asarray(out["params"]["text_encoder"]["transformer"]
                     ["embeddings"]["word"]["embedding"])
    want = hf.state_dict()["embeddings.word_embeddings.weight"].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # Model still runs with the spliced weights.
    res, _ = model.apply(
        {"params": out["params"], "batch_stats": out["batch_stats"]},
        batch, train=True, mutable=["batch_stats"],
        rngs={"prior": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)})
    assert np.isfinite(float(res["loss"]))


def test_non_resnet_pretrained_rejected(tmp_path):
    p = str(tmp_path / "x.pt")
    torch.save({}, p)
    cfg = Config(override_list=[
        "MODEL.VISUAL.NETWORK_NAME", "vgg19",
        "MODEL.VISUAL.FEATURE_SIZE", 1000,
        "MODEL.VISUAL.PRETRAINED", True,
        "MODEL.VISUAL.PRETRAINED_PATH", p,
    ])
    with pytest.raises(ValueError):
        apply_pretrained_weights({"params": {}, "batch_stats": {}}, cfg)
