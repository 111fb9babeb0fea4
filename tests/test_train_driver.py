"""Driver-level tests of clip_lite_tpu.train: cadence arithmetic with
device-side multi-step fusion, ZeRO-1 through the production path, and
val-sweep RNG distinctness (VERDICT round-1 items 3, 5, 7)."""

import glob
import os

import numpy as np
import pytest

import jax

from clip_lite_tpu.config import Config
from clip_lite_tpu.engine import (
    compile_eval_step,
    compile_train_step,
    create_train_state,
)
from clip_lite_tpu.factories import OptimizerFactory, PretrainingModelFactory
from clip_lite_tpu.parallel import create_mesh, shard_batch
from clip_lite_tpu.train import crossed_interval, main, parser

TINY_OVERRIDES = [
    "MODEL.NAME", "random", "DATA.NAME", "train_sbert",
    "MODEL.VISUAL.NETWORK_NAME", "resnet18",
    "MODEL.VISUAL.FEATURE_SIZE", 512,
    "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 1,
    "OPTIM.WARMUP_STEPS", 2,
    "OPTIM.BATCH_SIZE", 16,
    "DATA.IMAGE_CROP_SIZE", 32,
]


def _args(tmp_path, extra_overrides, extra_args=()):
    argv = ["--config-override"] + [str(x) for x in
                                    TINY_OVERRIDES + extra_overrides]
    argv += ["--serialization-dir", str(tmp_path), "--cpu-workers", "0"]
    argv += list(extra_args)
    return parser.parse_args(argv)


def test_crossed_interval_matches_modulo_for_k1():
    for it in range(1, 50):
        assert crossed_interval(it, 10, 1) == (it % 10 == 0)


def test_crossed_interval_k3_fires_once_per_boundary():
    # iteration advances 3,6,9,...; boundary every 10 must fire exactly
    # once per crossing even though 3 never divides 10.
    fired = [it for it in range(3, 100, 3) if crossed_interval(it, 10, 3)]
    assert fired == [12, 21, 30, 42, 51, 60, 72, 81, 90]
    # one firing per boundary: floor(it/10) strictly increases
    assert len(fired) == len({it // 10 for it in fired})


@pytest.mark.slow
def test_steps_per_call_checkpoints_fire(tmp_path):
    """K=3 with checkpoint_every=5: the old `% == 0` test never fires
    (VERDICT weak #4); the window test must checkpoint at 6 and 12."""
    args = _args(
        tmp_path,
        ["OPTIM.NUM_ITERATIONS", 13, "PARALLEL.STEPS_PER_CALL", 3],
        ["--checkpoint-every", "5", "--log-every", "5",
         "--climax-freq", "3"])
    main(args)
    ckpts = {os.path.basename(p) for p in
             glob.glob(os.path.join(str(tmp_path), "**",
                                    "checkpoint_*.msgpack"), recursive=True)}
    assert "checkpoint_6.msgpack" in ckpts
    assert "checkpoint_12.msgpack" in ckpts


@pytest.mark.slow
def test_zero1_through_driver(tmp_path):
    """Flagship-shaped config trains with PARALLEL.ZERO1 on the 8-device
    mesh through the real driver, checkpoints, and resumes."""
    args = _args(
        tmp_path,
        ["OPTIM.NUM_ITERATIONS", 4, "PARALLEL.ZERO1", True],
        ["--checkpoint-every", "2", "--log-every", "1"])
    main(args)
    hits = glob.glob(os.path.join(str(tmp_path), "**",
                                  "checkpoint_2.msgpack"), recursive=True)
    assert hits
    ckpt = hits[0]
    run_dir = os.path.dirname(ckpt)

    resume_args = _args(
        tmp_path,
        ["OPTIM.NUM_ITERATIONS", 4, "PARALLEL.ZERO1", True],
        ["--checkpoint-every", "2", "--log-every", "1",
         "--resume-from", ckpt])
    main(resume_args)
    assert os.path.exists(os.path.join(run_dir, "checkpoint_4.msgpack"))


def test_zero1_steps_per_call_conflict(tmp_path):
    args = _args(tmp_path, ["OPTIM.NUM_ITERATIONS", 4,
                            "PARALLEL.ZERO1", True,
                            "PARALLEL.STEPS_PER_CALL", 2])
    with pytest.raises(ValueError, match="ZERO1"):
        main(args)


@pytest.mark.slow
def test_val_rng_differs_across_batches():
    """Two val batches with different fold indices must draw different
    prior-discriminator noise (VERDICT weak #6: folding only state.step
    made every val batch identical)."""
    cfg = Config(override_list=[
        "MODEL.VISUAL.NETWORK_NAME", "resnet18",
        "MODEL.VISUAL.FEATURE_SIZE", 512,
        "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 1,
        "MODEL.TEXTUAL.VOCAB_SIZE", 64,
        "OPTIM.BATCH_SIZE", 16,
    ])
    model = PretrainingModelFactory.from_config(cfg)
    tx = OptimizerFactory.from_config(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "image": np.asarray(rng.randn(16, 32, 32, 3), np.float32),
        "input_ids": np.asarray(rng.randint(0, 64, (16, 8)), np.int32),
        "attention_mask": np.ones((16, 8), np.int32),
    }
    state = create_train_state(model, tx, batch)
    mesh = create_mesh()
    eval_fn = compile_eval_step(model, mesh)
    sharded = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)
    # Same batch, the per-batch fold the train loop now applies:
    a = float(eval_fn(state, sharded, jax.random.fold_in(key, 0))["total_loss"])
    b = float(eval_fn(state, sharded, jax.random.fold_in(key, 1))["total_loss"])
    assert a != b  # prior noise differs
    # cross_modal has no RNG dependence - stays bitwise equal
    ca = float(eval_fn(state, sharded, jax.random.fold_in(key, 0))["cross_modal_loss"])
    cb = float(eval_fn(state, sharded, jax.random.fold_in(key, 1))["cross_modal_loss"])
    assert ca == cb
