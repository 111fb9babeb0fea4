"""CheckpointManager tests: round-trip, rotation, best-metric, climax,
latest lookup, atomicity."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from clip_lite_tpu.engine import TrainState
from clip_lite_tpu.utils import checkpointing as ckpt_mod
from clip_lite_tpu.utils.checkpointing import (
    CheckpointManager,
    latest_checkpoint,
    load_model_variables,
)

# Always-run smoke gate: pure math, single device, no mesh (pytest -m smoke).
pytestmark = pytest.mark.smoke


def tiny_state(value=1.0):
    return TrainState(
        step=jnp.asarray(3, jnp.int32),
        params={"layer": {"w": jnp.full((4,), value)}},
        batch_stats={"layer": {"mean": jnp.zeros(4)}},
        opt_state=(jnp.asarray(7, jnp.int32), {"m": jnp.ones(2)}),
    )


def test_roundtrip(tmp_path):
    m = CheckpointManager(str(tmp_path), state=tiny_state(2.5))
    path = m.step(10)
    m2 = CheckpointManager(str(tmp_path), state=tiny_state(0.0))
    it = m2.load(path)
    assert it == 10
    restored = m2.restored("state")
    np.testing.assert_array_equal(
        np.asarray(restored.params["layer"]["w"]), np.full(4, 2.5))
    assert int(restored.step) == 3
    assert int(restored.opt_state[0]) == 7


def test_rotation(tmp_path):
    m = CheckpointManager(str(tmp_path), keep_recent=2, state=tiny_state())
    for it in (1, 2, 3, 4):
        m.step(it)
    files = sorted(os.listdir(tmp_path))
    assert "checkpoint_1.msgpack" not in files
    assert "checkpoint_2.msgpack" not in files
    assert "checkpoint_3.msgpack" in files and "checkpoint_4.msgpack" in files


def test_best_metric_min_mode(tmp_path):
    m = CheckpointManager(str(tmp_path), state=tiny_state(1.0))
    m.step(1, metric=5.0)
    m.checkpointables["state"] = tiny_state(2.0)
    m.step(2, metric=3.0)  # better
    m.checkpointables["state"] = tiny_state(9.0)
    m.step(3, metric=4.0)  # worse; best stays from it=2
    best = load_model_variables(str(tmp_path / "checkpoint_best.msgpack"))
    np.testing.assert_array_equal(
        np.asarray(best["params"]["layer"]["w"]), np.full(4, 2.0))


def test_climax_model_only(tmp_path):
    m = CheckpointManager(str(tmp_path), state=tiny_state(3.0))
    path = m.climax_step(42)
    assert "climax_model_42" in path
    variables = load_model_variables(path)
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["layer"]["w"]), np.full(4, 3.0))
    assert "opt_state" not in variables


def test_latest_checkpoint(tmp_path):
    m = CheckpointManager(str(tmp_path), state=tiny_state())
    m.step(5)
    m.step(20)
    m.climax_step(99)  # climax snapshots are not "latest" candidates
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint_20.msgpack")
    assert latest_checkpoint("/tmp/definitely_empty_dir_xyz") is None


def test_no_partial_files_on_disk(tmp_path):
    m = CheckpointManager(str(tmp_path), state=tiny_state())
    m.step(1)
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]


def test_load_tolerates_extra_checkpointables(tmp_path):
    """Loading a checkpoint that contains MORE checkpointables than the
    manager knows (e.g. older run) must not crash (reference tolerant
    load, utils/checkpointing.py:195-222)."""
    m = CheckpointManager(str(tmp_path), state=tiny_state(),
                          extra={"x": jnp.ones(3)})
    path = m.step(7)
    m2 = CheckpointManager(str(tmp_path), state=tiny_state(0.0))
    assert m2.load(path) == 7


def test_async_writes_roundtrip_and_best(tmp_path):
    """Async mode: step() returns immediately, wait() drains, files are
    byte-identical in content semantics to the sync path (same payload),
    and best tracking runs in save order on the worker."""
    m = CheckpointManager(str(tmp_path), async_writes=True,
                          state=tiny_state(1.0))
    p1 = m.step(10, metric=0.9)
    m.checkpointables["state"] = tiny_state(2.0)
    p2 = m.step(20, metric=0.5)     # better -> becomes best
    m.checkpointables["state"] = tiny_state(3.0)
    p3 = m.step(30, metric=0.7)     # worse -> best unchanged
    m.wait()
    for p in (p1, p2, p3):
        assert os.path.exists(p)
    best = os.path.join(str(tmp_path), "checkpoint_best.msgpack")
    assert os.path.exists(best)
    loader = CheckpointManager(str(tmp_path), state=tiny_state(0.0))
    assert loader.load(best) == 20
    np.testing.assert_array_equal(
        np.asarray(loader.restored("state").params["layer"]["w"]),
        np.full(4, 2.0))
    # load() on the async manager itself drains the queue first
    m.checkpointables["state"] = tiny_state(9.0)
    p4 = m.step(40)
    it = m.load(p4)
    assert it == 40


def test_async_step_survives_donation_of_originals(tmp_path, monkeypatch):
    """The async worker must fetch from a DECOUPLED snapshot: right after
    step() returns, the train loop dispatches the next step, which donates
    (invalidates) the very state buffers the worker is about to fetch
    (engine.compile_train_step donate_argnums=(0,); round-3 verdict weak
    #3).  Simulated with .delete() — the strongest invalidation — gated so
    the deletion provably lands BEFORE the worker's device->host fetch."""
    import threading

    import jax

    import clip_lite_tpu.utils.checkpointing as C

    release = threading.Event()
    real_to_host = C._to_host

    def gated_to_host(tree):
        assert release.wait(timeout=30)
        return real_to_host(tree)

    monkeypatch.setattr(C, "_to_host", gated_to_host)

    state = tiny_state(4.5)
    m = CheckpointManager(str(tmp_path), async_writes=True, state=state)
    p1 = m.step(11)
    # Invalidate every original device buffer, as a donating dispatch would.
    for leaf in jax.tree.leaves(state):
        if isinstance(leaf, jax.Array):
            leaf.delete()
    release.set()
    m.wait()
    loader = CheckpointManager(str(tmp_path), state=tiny_state(0.0))
    assert loader.load(p1) == 11
    np.testing.assert_array_equal(
        np.asarray(loader.restored("state").params["layer"]["w"]),
        np.full(4, 4.5))

    # Same contract for climax (model-only) snapshots.
    release.clear()
    state2 = tiny_state(6.25)
    m.checkpointables["state"] = state2
    p2 = m.climax_step(12)
    for leaf in jax.tree.leaves(state2):
        if isinstance(leaf, jax.Array):
            leaf.delete()
    release.set()
    m.wait()
    variables = load_model_variables(p2)
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["layer"]["w"]), np.full(4, 6.25))


def test_async_write_failure_is_raised_on_wait(tmp_path, monkeypatch):
    m = CheckpointManager(str(tmp_path), async_writes=True,
                          state=tiny_state())
    import clip_lite_tpu.utils.checkpointing as C

    def boom(path, data):
        raise OSError("disk full")

    monkeypatch.setattr(C, "_atomic_write", boom)
    m.step(10)
    with pytest.raises(OSError, match="disk full"):
        m.wait()


def test_globalize_is_identity_when_fully_addressable():
    """Single-host / replicated trees must pass through untouched (no
    copies, no collectives)."""
    tree = {"np": np.arange(4), "jax": jnp.ones((2, 2)), "s": 3}
    out = ckpt_mod._globalize(tree)
    assert out["np"] is tree["np"]
    assert out["jax"] is tree["jax"]
    assert out["s"] == 3


def test_globalize_gathers_non_addressable_leaves(monkeypatch):
    """ZeRO-1 shards opt state across the whole mesh; on multi-host runs
    host 0 cannot fetch those leaves directly — _globalize must route them
    through process_allgather (and leave addressable leaves alone)."""
    import jax

    sharded = jnp.arange(8.0)
    replicated = jnp.ones(3)
    monkeypatch.setattr(ckpt_mod, "_needs_gather", lambda x: x is sharded)
    calls = {}

    def fake_allgather(leaves, tiled):
        calls["leaves"] = leaves
        calls["tiled"] = tiled
        return [np.asarray(l) * 10 for l in leaves]

    monkeypatch.setattr("jax.experimental.multihost_utils.process_allgather",
                        fake_allgather)
    out = ckpt_mod._globalize({"opt": sharded, "p": replicated})
    assert calls["tiled"] is True
    assert len(calls["leaves"]) == 1
    np.testing.assert_array_equal(np.asarray(out["opt"]),
                                  np.arange(8.0) * 10)
    assert out["p"] is replicated


def test_apply_platform_args_tolerates_missing_multihost_attrs():
    """Eval CLI arg namespaces may lack --num-hosts entirely; the platform
    hook must not blow up on the absent attribute."""
    import argparse

    from clip_lite_tpu.utils.common import apply_platform_args

    args = argparse.Namespace(platform=None, virtual_devices=None)
    apply_platform_args(args)  # must not raise
