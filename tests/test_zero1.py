"""ZeRO-1 sharded weight update: must reproduce the replicated optax path
exactly (same params after several steps, including a Lookahead sync)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_lite_tpu.config import Config
from clip_lite_tpu.engine import (
    compile_train_step,
    create_train_state,
)
from clip_lite_tpu.factories import OptimizerFactory, PretrainingModelFactory
from clip_lite_tpu.parallel import create_mesh, shard_batch
from clip_lite_tpu.parallel.zero1 import (
    build_flat_hyperparams,
    compile_zero1_train_step,
    create_zero1_opt_state,
)

pytestmark = pytest.mark.slow  # compile/parity heavy; fast loop: -m 'not slow'

TINY = [
    "MODEL.VISUAL.NETWORK_NAME", "zoo::resnet8",
    "MODEL.VISUAL.FEATURE_SIZE", 64,
    "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 1,
    "MODEL.TEXTUAL.VOCAB_SIZE", 64,
    "MODEL.LOSS.TEXT_PRIOR", False,
    "MODEL.LOSS.IMAGE_PRIOR", False,  # avoid rng-order differences
    "AMP", False,
    "OPTIM.NUM_ITERATIONS", 100,
    "OPTIM.WARMUP_STEPS", 2,
]


def tiny_batch(seed=0, b=16, s=8, crop=32):
    rng = np.random.RandomState(seed)
    return {
        "image": jnp.asarray(rng.randn(b, crop, crop, 3), jnp.float32),
        "input_ids": jnp.asarray(rng.randint(0, 64, (b, s))),
        "attention_mask": jnp.ones((b, s), jnp.int32),
    }


@pytest.mark.parametrize("opt_name", ["sgd", "adamw"])
def test_zero1_matches_replicated(opt_name):
    """Step-exact equivalence: from the SAME state (replicated trajectory,
    ZeRO-1 optimizer state converted each step via zero1_state_from_optax),
    one ZeRO-1 step must reproduce one replicated optax step to float
    tolerance.  Trajectories are compared per-step because BN + clipping
    at CNN_LR=0.2 amplify last-ulp reduction-order noise ~30x/step."""
    from clip_lite_tpu.parallel.zero1 import zero1_state_from_optax

    cfg = Config(override_list=TINY + ["OPTIM.OPTIMIZER_NAME", opt_name])
    model = PretrainingModelFactory.from_config(cfg)
    tx = OptimizerFactory.from_config(cfg)
    batch = tiny_batch()
    mesh = create_mesh()

    state_rep = create_train_state(model, tx, batch)
    step_rep = compile_train_step(model, tx, mesh, donate=False)
    step_z = compile_zero1_train_step(model, cfg, mesh, state_rep.params)

    db = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(0)
    for i in range(6):  # crosses the Lookahead sync at step 5
        # Sync ZeRO-1 to the replicated state, then step both once.
        state_z = state_rep.replace(opt_state=zero1_state_from_optax(
            state_rep.opt_state, state_rep.params, mesh))
        state_rep, m_rep = step_rep(state_rep, db, rng)
        state_z, m_z = step_z(state_z, db, rng)

        np.testing.assert_allclose(float(m_rep["grad_norm"]),
                                   float(m_z["grad_norm"]), rtol=1e-4)
        flat_rep = jax.flatten_util.ravel_pytree(state_rep.params)[0]
        flat_z = jax.flatten_util.ravel_pytree(state_z.params)[0]
        np.testing.assert_allclose(np.asarray(flat_z), np.asarray(flat_rep),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"step {i + 1}")


def test_zero1_state_is_sharded():
    cfg = Config(override_list=TINY)
    model = PretrainingModelFactory.from_config(cfg)
    tx = OptimizerFactory.from_config(cfg)
    state = create_train_state(model, tx, tiny_batch())
    mesh = create_mesh()
    opt = create_zero1_opt_state(state.params, mesh)
    assert not opt.momentum.sharding.is_fully_replicated
    n = mesh.devices.size
    assert opt.momentum.shape[0] % n == 0


def test_flat_hyperparams_group_lrs():
    cfg = Config(override_list=TINY)
    model = PretrainingModelFactory.from_config(cfg)
    tx = OptimizerFactory.from_config(cfg)
    state = create_train_state(model, tx, tiny_batch())
    lr_vec, wd_vec, unravel, flat_len = build_flat_hyperparams(
        state.params, cfg)
    lrs = np.unique(np.asarray(lr_vec))
    np.testing.assert_allclose(sorted(lrs),
                               sorted([cfg.OPTIM.LR, cfg.OPTIM.CNN_LR]),
                               rtol=1e-6)  # TRANS_LR == LR here
    # weight decay applied everywhere (reference NO_DECAY regex matches
    # nothing; see optim/__init__.py docstring)
    np.testing.assert_allclose(np.unique(np.asarray(wd_vec)),
                               [cfg.OPTIM.WEIGHT_DECAY], rtol=1e-6)


def test_zero1_single_device_matches_replicated():
    """The 1-device mesh takes the plain-jit fallback (no shard_map, no
    collectives — the single-chip deployment path of PARALLEL.ZERO1
    configs like fs_tpu_tuned.yaml); it must walk the same trajectory as
    the replicated optax chain, including the Lookahead sync at step 5."""
    from clip_lite_tpu.parallel.zero1 import zero1_state_from_optax

    cfg = Config(override_list=TINY)
    model = PretrainingModelFactory.from_config(cfg)
    tx = OptimizerFactory.from_config(cfg)
    batch = tiny_batch()
    mesh = create_mesh(num_devices=1)

    state_rep = create_train_state(model, tx, batch)
    step_rep = compile_train_step(model, tx, mesh, donate=False)
    step_z = compile_zero1_train_step(model, cfg, mesh, state_rep.params)

    state_z = state_rep.replace(opt_state=zero1_state_from_optax(
        state_rep.opt_state, state_rep.params, mesh))
    db = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(0)
    for i in range(6):
        state_rep, m_rep = step_rep(state_rep, db, rng)
        state_z, m_z = step_z(state_z, db, rng)
        np.testing.assert_allclose(float(m_rep["grad_norm"]),
                                   float(m_z["grad_norm"]), rtol=1e-4)
        flat_rep = jax.flatten_util.ravel_pytree(state_rep.params)[0]
        flat_z = jax.flatten_util.ravel_pytree(state_z.params)[0]
        np.testing.assert_allclose(np.asarray(flat_z), np.asarray(flat_rep),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"step {i + 1}")
