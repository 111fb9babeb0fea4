"""EncoderBundle tests: chunked tail-padded encoding, glove text path,
sync-BN mode compile coverage."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_lite_tpu.config import Config
from clip_lite_tpu.eval_utils import EncoderBundle, _chunked


def test_chunked_tail_padding():
    calls = []

    def fn(x):
        calls.append(x.shape[0])
        return x * 2

    out = _chunked(fn, 4, np.arange(10, dtype=np.float32).reshape(10, 1))
    np.testing.assert_allclose(out[:, 0], np.arange(10) * 2)
    assert all(c == 4 for c in calls)  # every call is the compiled shape


@pytest.fixture(scope="module")
def tiny_cfg_overrides():
    return ["MODEL.VISUAL.NETWORK_NAME", "zoo::resnet8",
            "MODEL.VISUAL.FEATURE_SIZE", 64,
            "DATA.IMAGE_CROP_SIZE", 32, "DATA.MAX_CAPTION_LENGTH", 8,
            "AMP", False]


def test_bundle_encode_images_and_texts(tiny_cfg_overrides):
    cfg = Config(override_list=tiny_cfg_overrides + [
        "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 1,
        "MODEL.TEXTUAL.VOCAB_SIZE", 128])
    bundle = EncoderBundle(cfg, checkpoint_path=None, batch_size=4)
    imgs = np.random.RandomState(0).randn(6, 32, 32, 3).astype(np.float32)
    feats = bundle.encode_images(imgs)
    assert feats.shape == (6, 2048)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-4)

    from clip_lite_tpu.data.tokenizers import HashingTokenizer

    # 128 >= 104: the smallest vocab that can hold the BERT special ids.
    tok = HashingTokenizer(vocab_size=128, max_length=8)
    txt = bundle.encode_texts(["a dog", "a cat on a mat", "hello"], tok)
    assert txt.shape == (3, 2048)


def test_bundle_glove_mode(tiny_cfg_overrides):
    from clip_lite_tpu.data.tokenizers import GloveTokenizer

    cfg = Config(override_list=tiny_cfg_overrides + [
        "MODEL.TEXTUAL.NAME", "glove", "DATA.NAME", "glove"])
    bundle = EncoderBundle(cfg, checkpoint_path=None, batch_size=4)
    tok = GloveTokenizer(word_dict={"a": 0, "dog": 1, "cat": 2})
    feats = bundle.encode_texts(["a dog", "a cat"], tok)
    assert feats.shape == (2, 2048)
    assert np.isfinite(feats).all()


def test_sync_bn_mode_compiles_on_mesh():
    """MODEL.VISUAL.BN_MODE=sync: cross-device BN stats via psum under
    shard_map (the quality upgrade SURVEY hard-part 4 calls out)."""
    from clip_lite_tpu.engine import compile_train_step, create_train_state
    from clip_lite_tpu.factories import (
        OptimizerFactory,
        PretrainingModelFactory,
    )
    from clip_lite_tpu.parallel import create_mesh, shard_batch

    cfg = Config(override_list=[
        "MODEL.VISUAL.NETWORK_NAME", "resnet18",
        "MODEL.VISUAL.FEATURE_SIZE", 512,
        "MODEL.VISUAL.BN_MODE", "sync",
        "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 1,
        "MODEL.TEXTUAL.VOCAB_SIZE", 64,
        "MODEL.LOSS.TEXT_PRIOR", False, "AMP", False,
        "OPTIM.WARMUP_STEPS", 2, "OPTIM.NUM_ITERATIONS", 10])
    model = PretrainingModelFactory.from_config(cfg)
    tx = OptimizerFactory.from_config(cfg)
    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.randn(16, 32, 32, 3), jnp.float32),
             "input_ids": jnp.asarray(rng.randint(0, 64, (16, 8))),
             "attention_mask": jnp.ones((16, 8), jnp.int32)}
    mesh = create_mesh()
    # Sync-BN psums batch stats over the axis, so init must also happen
    # inside the mesh context; use eval-mode init then one train step.
    state = create_train_state(model, tx, batch)
    step = compile_train_step(model, tx, mesh, donate=False)
    new_state, metrics = step(state, shard_batch(batch, mesh),
                              jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
