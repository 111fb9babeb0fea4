"""Checkpoint management for TrainState pytrees.

Equivalent of the reference's CheckpointManager
(reference: utils/checkpointing.py:12-222): iteration-keyed serialization
of every registered checkpointable, best-metric tracking, rotation of
recent checkpoints, model-only "climax" snapshots for the dense
end-of-training sweep (reference: utils/checkpointing.py:106-131,
consumed by voc_clf.py:176-270), and a tolerant ``load`` that returns the
stored iteration.

Serialization is flax msgpack of the state pytree — single-controller, so
no rank gating is needed (the reference writes from the master process
only, train.py:251-255).  Device arrays are pulled to host once per save.

With ``async_writes=True`` the device->host fetch, serialization and
file write happen on a single background worker thread and ``step()``
returns immediately — the flagship state is ~1.9 GB and a synchronous
save stalls training for minutes through a tunneled device.  Immutability
of jax.Arrays alone does NOT make this safe: the next train step DONATES
the state buffers (engine.compile_train_step ``donate_argnums=(0,)``),
which invalidates them under the worker's device->host fetch.  ``step()``
therefore snapshots every device leaf via one jitted device-side copy
(fresh buffers, ~ms of HBM traffic) BEFORE returning — the worker fetches
from the snapshot, immune to donation/deletion of the originals.  Saves
are ordered by the one-worker queue; ``wait()`` (called before load and
at shutdown) drains it.  The reference has no async equivalent; this
mirrors orbax's async checkpointing shape on the custom msgpack format.
"""

from __future__ import annotations

import glob
import os
import re
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


@jax.jit
def _copy_leaves(xs):
    """Device-side copy of a list of arrays as ONE compiled program.

    Outputs are fresh buffers (XLA never aliases input to output without
    a donation annotation), so they survive donation or ``.delete()`` of
    the inputs.  jnp.copy rather than identity: jit passes untouched
    arguments through as the SAME array, which would defeat the point.
    """
    import jax.numpy as jnp

    return [jnp.copy(x) for x in xs]


def _snapshot(tree):
    """Decouple a pytree from its caller: device leaves are copied on
    device (cheap HBM traffic, no host round-trip); host leaves pass
    through.  The async worker fetches from this snapshot, so the next
    train step donating the original state buffers cannot corrupt an
    in-flight save."""
    leaves, treedef = jax.tree.flatten(tree)
    idx = [i for i, x in enumerate(leaves)
           if isinstance(x, jax.Array) and not x.is_deleted()]
    if idx:
        copies = _copy_leaves([leaves[i] for i in idx])
        for i, c in zip(idx, copies):
            leaves[i] = c
    return jax.tree.unflatten(treedef, leaves)


def _needs_gather(x) -> bool:
    return isinstance(x, jax.Array) and not x.is_fully_addressable


def _globalize(tree):
    """Make every leaf fully addressable.

    ZeRO-1 shards optimizer state P(data_axis) across the WHOLE mesh
    (parallel/zero1.py); on a multi-host run host 0 cannot fetch those
    leaves (`np.asarray` on an array spanning non-addressable devices
    raises).  Such leaves are all-gathered to every process here.  This
    is a COLLECTIVE: every host must call it, so it runs BEFORE the
    host-0 write gate in step()/climax_step().  Fully-addressable trees
    (single host, or replicated state) pass through untouched.
    """
    leaves, treedef = jax.tree.flatten(tree)
    idx = [i for i, x in enumerate(leaves) if _needs_gather(x)]
    if idx:
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(
            [leaves[i] for i in idx], tiled=True)
        for i, g in zip(idx, gathered):
            leaves[i] = g
    return jax.tree.unflatten(treedef, leaves)


def _atomic_write(path: str, data: bytes) -> None:
    """Write via temp file + rename so a crash/kill mid-write can never
    leave a truncated checkpoint behind."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class CheckpointManager:
    """Saves/loads msgpack checkpoints named ``checkpoint_{it}.msgpack``."""

    def __init__(self, serialization_dir: str = "/tmp",
                 keep_recent: int = 100, async_writes: bool = False,
                 **checkpointables: Any):
        self.serialization_dir = serialization_dir
        self.keep_recent = keep_recent
        self.checkpointables = dict(checkpointables)
        self._best_metric: Optional[float] = None
        self._recent: list = []
        self._executor = (ThreadPoolExecutor(max_workers=1)
                          if async_writes else None)
        self._pending = None
        os.makedirs(serialization_dir, exist_ok=True)

    @staticmethod
    def _is_writer() -> bool:
        """Multi-host: only host 0 touches the filesystem (the reference's
        master-only saves, train.py:251-255).  Params/batch_stats are
        replicated across hosts; leaves that are NOT fully addressable
        (ZeRO-1 optimizer shards) are all-gathered by _globalize before
        this gate, so host 0's copy is the global truth."""
        from clip_lite_tpu.parallel.distributed import is_primary_host

        return is_primary_host()  # True on single-host runs by definition

    # -- saving ------------------------------------------------------------
    def step(self, iteration: int, metric: Optional[float] = None,
             mode: str = "min") -> str:
        """Serialize all checkpointables + iteration; track best metric.
        Async mode: snapshots the (immutable) pytrees now, does the
        fetch/serialize/write on the worker, returns the path at once.
        Non-primary hosts: no-op (returns the path host 0 writes)."""
        path = os.path.join(self.serialization_dir,
                            f"checkpoint_{iteration}.msgpack")
        # Collective (multi-host + sharded leaves): all hosts participate.
        objs = _globalize(dict(self.checkpointables))
        if not self._is_writer():
            return path
        if self._executor is not None:
            self.wait()  # at most one save in flight
            objs = _snapshot(objs)  # decouple from later buffer donation
            self._pending = self._executor.submit(
                self._write_step, objs, iteration, path, metric, mode)
        else:
            self._write_step(objs, iteration, path, metric, mode)
        return path

    def _write_step(self, objs, iteration, path, metric, mode) -> None:
        payload = {name: serialization.to_state_dict(_to_host(obj))
                   for name, obj in objs.items()}
        payload["iteration"] = np.int64(iteration)
        data = serialization.msgpack_serialize(payload)
        _atomic_write(path, data)

        if metric is not None:
            better = (self._best_metric is None
                      or (mode == "min" and metric < self._best_metric)
                      or (mode == "max" and metric > self._best_metric))
            if better:
                self._best_metric = float(metric)
                best = os.path.join(self.serialization_dir,
                                    "checkpoint_best.msgpack")
                _atomic_write(best, data)  # same bytes, no re-serialize

        self._recent.append(path)
        while len(self._recent) > self.keep_recent:
            old = self._recent.pop(0)
            if os.path.exists(old):
                os.remove(old)

    def wait(self) -> None:
        """Drain the in-flight async save (no-op in sync mode).  Raises
        whatever the worker raised, so write failures are never silent."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()

    def climax_step(self, iteration: int,
                    model_key: str = "state") -> str:
        """Model-only dense snapshot (params + batch_stats, no optimizer) —
        the reference's end-of-training sweep artifact
        (utils/checkpointing.py:106-131)."""
        state = self.checkpointables[model_key]
        path = os.path.join(self.serialization_dir,
                            f"climax_model_{iteration}.msgpack")
        # Collective (multi-host + sharded leaves): all hosts participate.
        state = state.replace(params=_globalize(state.params),
                              batch_stats=_globalize(state.batch_stats))
        if not self._is_writer():
            return path
        if self._executor is not None:
            self.wait()
            state = state.replace(params=_snapshot(state.params),
                                  batch_stats=_snapshot(state.batch_stats))
            self._pending = self._executor.submit(
                self._write_climax, state, iteration, path)
        else:
            self._write_climax(state, iteration, path)
        return path

    def _write_climax(self, state, iteration, path) -> None:
        payload = {
            "params": serialization.to_state_dict(_to_host(state.params)),
            "batch_stats": serialization.to_state_dict(
                _to_host(state.batch_stats)),
            "iteration": np.int64(iteration),
        }
        _atomic_write(path, serialization.msgpack_serialize(payload))

    # -- loading -----------------------------------------------------------
    def load(self, path: str) -> int:
        """Restore checkpointables in place (pytrees are rebuilt with the
        stored leaves via flax ``from_state_dict``); returns iteration."""
        self.wait()
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        iteration = int(payload.pop("iteration", 0))
        for name, stored in payload.items():
            if name in self.checkpointables:
                target = self.checkpointables[name]
                self.checkpointables[name] = serialization.from_state_dict(
                    target, stored)
        return iteration

    def restored(self, name: str):
        return self.checkpointables[name]


def peek_iteration(path: str) -> int:
    """Read only the stored iteration from a checkpoint — lets the driver
    decide the data-curriculum phase BEFORE constructing any loader or
    state (train.py resume path)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return int(payload.get("iteration", 0))


def load_model_variables(path: str) -> Dict[str, Any]:
    """Load {params, batch_stats} from either a full checkpoint or a
    climax snapshot — what downstream evals consume."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if "params" in payload:  # climax snapshot
        return {"params": payload["params"],
                "batch_stats": payload.get("batch_stats", {})}
    state = payload.get("state", {})
    return {"params": state["params"],
            "batch_stats": state.get("batch_stats", {})}


def latest_checkpoint(serialization_dir: str) -> Optional[str]:
    """Most recent full checkpoint in a directory, by iteration."""
    paths = glob.glob(os.path.join(serialization_dir, "checkpoint_*.msgpack"))
    best_it, best_path = -1, None
    for p in paths:
        m = re.search(r"checkpoint_(\d+)\.msgpack$", p)
        if m and int(m.group(1)) > best_it:
            best_it, best_path = int(m.group(1)), p
    return best_path
