"""Engine tests: compiled SPMD train step on the 8-device mesh — loss
decreases, state stays replicated, donation works, eval step runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_lite_tpu.config import Config
from clip_lite_tpu.engine import (
    compile_eval_step,
    compile_train_step,
    create_train_state,
)
from clip_lite_tpu.factories import (
    LRSchedulerFactory,
    OptimizerFactory,
    PretrainingModelFactory,
)
from clip_lite_tpu.parallel import create_mesh, shard_batch

pytestmark = pytest.mark.slow  # compile/parity heavy; fast loop: -m 'not slow'


TINY = [
    "MODEL.VISUAL.NETWORK_NAME", "resnet18",
    "MODEL.VISUAL.FEATURE_SIZE", 512,
    "MODEL.TEXTUAL.NUM_HIDDEN_LAYERS", 1,
    "MODEL.TEXTUAL.VOCAB_SIZE", 64,
    "MODEL.LOSS.TEXT_PRIOR", False,
    "AMP", False,
    "OPTIM.NUM_ITERATIONS", 100,
    "OPTIM.WARMUP_STEPS", 2,
    "OPTIM.BATCH_SIZE", 16,
    # Flagship CNN_LR=0.2 is chaotic on a 16-pair random batch: per-step
    # divergence amplification makes the 12-step descent check flip on
    # any (legitimate) float-ordering change.  0.02 is in the stable
    # descent regime; correctness-at-flagship-LR is pinned elsewhere
    # (test_trajectory torch parity, test_zero1 equivalence).
    "OPTIM.CNN_LR", 0.02,
]


def tiny_batch(seed=0, b=16, s=8, crop=32):
    rng = np.random.RandomState(seed)
    return {
        "image": jnp.asarray(rng.randn(b, crop, crop, 3), jnp.float32),
        "input_ids": jnp.asarray(rng.randint(0, 64, (b, s))),
        "attention_mask": jnp.ones((b, s), jnp.int32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = Config(override_list=TINY)
    model = PretrainingModelFactory.from_config(cfg)
    tx = OptimizerFactory.from_config(cfg)
    state = create_train_state(model, tx, tiny_batch())
    mesh = create_mesh()
    return cfg, model, tx, state, mesh


def test_train_step_runs_and_counts(setup):
    cfg, model, tx, state, mesh = setup
    step_fn = compile_train_step(model, tx, mesh, donate=False)
    batch = shard_batch(tiny_batch(1), mesh)
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_loss_decreases_over_steps(setup):
    cfg, model, tx, state, mesh = setup
    step_fn = compile_train_step(model, tx, mesh, donate=False)
    batch = shard_batch(tiny_batch(2), mesh)
    rng = jax.random.PRNGKey(0)
    first = None
    for i in range(12):
        state, metrics = step_fn(state, batch, rng)
        if first is None:
            first = float(metrics["cross_modal_loss"])
    last = float(metrics["cross_modal_loss"])
    assert last < first, (first, last)


def test_params_stay_replicated(setup):
    cfg, model, tx, state, mesh = setup
    step_fn = compile_train_step(model, tx, mesh, donate=False)
    batch = shard_batch(tiny_batch(3), mesh)
    new_state, _ = step_fn(state, batch, jax.random.PRNGKey(0))
    kernel = new_state.params["loss"]["global_d"]["img_block"]["shortcut"]["kernel"]
    assert kernel.sharding.is_fully_replicated


def test_eval_step(setup):
    cfg, model, tx, state, mesh = setup
    eval_fn = compile_eval_step(model, mesh)
    batch = shard_batch(tiny_batch(4), mesh)
    comps = eval_fn(state, batch, jax.random.PRNGKey(0))
    assert set(comps) >= {"total_loss", "cross_modal_loss"}
    assert np.isfinite(float(comps["total_loss"]))


def test_donation(setup):
    cfg, model, tx, state, mesh = setup
    step_fn = compile_train_step(model, tx, mesh, donate=True)
    batch = shard_batch(tiny_batch(5), mesh)
    # Donate a private copy: the fixture state must stay alive for other
    # tests (donated buffers are deleted).
    own_state = jax.tree.map(jnp.copy, state)
    new_state, _ = step_fn(own_state, batch, jax.random.PRNGKey(0))
    assert int(new_state.step) == 1


def test_determinism_same_rng(setup):
    cfg, model, tx, state, mesh = setup
    step_fn = compile_train_step(model, tx, mesh, donate=False)
    batch = shard_batch(tiny_batch(6), mesh)
    s1, m1 = step_fn(state, batch, jax.random.PRNGKey(7))
    s2, m2 = step_fn(state, batch, jax.random.PRNGKey(7))
    assert float(m1["total_loss"]) == float(m2["total_loss"])
    # different rng -> different prior noise -> different total loss
    _, m3 = step_fn(state, batch, jax.random.PRNGKey(8))
    assert float(m1["total_loss"]) != float(m3["total_loss"])


def test_hoisted_step_keeps_slow_tree_out_of_program(setup):
    """Hoisted-Lookahead mode: the compiled step must neither copy nor
    touch the slow tree (engine._strip_slow — without donation XLA would
    copy the full slow tree through the output every step), and the
    full-step trajectory must match the in-step Lookahead at the same
    cadence, through shard_map AND through the AOT lower().compile()
    surface."""
    cfg, model, _, _, mesh = setup
    k = 3
    la_cfg = Config(override_list=TINY + [
        "OPTIM.LOOKAHEAD.USE", True, "OPTIM.LOOKAHEAD.STEPS", k,
    ])
    from clip_lite_tpu.optim.fused import build_lookahead_sync

    tx_h = OptimizerFactory.from_config(la_cfg, hoist_lookahead=True)
    tx_i = OptimizerFactory.from_config(la_cfg)
    assert tx_h.hoisted and not tx_i.hoisted
    state_h = create_train_state(model, tx_h, tiny_batch())
    state_i = create_train_state(model, tx_i, tiny_batch())
    step_h = compile_train_step(model, tx_h, mesh, donate=False)
    step_i = compile_train_step(model, tx_i, mesh, donate=False)
    la_sync = build_lookahead_sync(la_cfg)
    batch = shard_batch(tiny_batch(9), mesh)
    rng = jax.random.PRNGKey(0)

    for it in range(1, k + 2):
        slow_before = jax.tree.leaves(state_h.opt_state.slow_params)
        state_h, m_h = step_h(state_h, batch, rng)
        state_i, m_i = step_i(state_i, batch, rng)
        # The slow leaves are the very same arrays — never copied,
        # never entered the compiled program.
        for a, b in zip(slow_before,
                        jax.tree.leaves(state_h.opt_state.slow_params)):
            assert a is b
        if it % k == 0:
            p, s = la_sync(state_h.params, state_h.opt_state.slow_params)
            state_h = state_h.replace(
                params=p,
                opt_state=state_h.opt_state._replace(slow_params=s))
        np.testing.assert_allclose(float(m_h["total_loss"]),
                                   float(m_i["total_loss"]), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(state_h.params),
                        jax.tree.leaves(state_i.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=1e-6,
                                       err_msg=f"params step {it}")
        for a, b in zip(jax.tree.leaves(state_h.opt_state.slow_params),
                        jax.tree.leaves(state_i.opt_state.slow_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=1e-6,
                                       err_msg=f"slow step {it}")

    # AOT surface: lower().compile() honors the same full-state contract.
    compiled = step_h.lower(state_h, batch, rng).compile()
    slow_before = jax.tree.leaves(state_h.opt_state.slow_params)
    new_state, metrics = compiled(state_h, batch, rng)
    for a, b in zip(slow_before,
                    jax.tree.leaves(new_state.opt_state.slow_params)):
        assert a is b
    assert np.isfinite(float(metrics["total_loss"]))
