"""Training engine: TrainState + compiled SPMD train/eval steps.

The reference's hot loop (reference: train.py:195-296) is
forward -> backward -> DDP allreduce -> clip -> SGD/Lookahead -> scheduler,
spread across Python, autograd hooks, and NCCL.  Here the entire update is
ONE compiled XLA program per step, shard_map'ed over the data mesh axis:

  * batch sharded on ``data``; params/opt-state replicated;
  * grads psum'd over ICI (the DDP-allreduce equivalent, but fused into
    the compiled program and overlapped by XLA's scheduler);
  * loss metrics pmean'd (replaces utils/distributed.py:141-159);
  * BatchNorm running stats pmean'd so the replicated state stays exact
    (the reference keeps divergent per-rank stats and checkpoints rank 0's);
  * per-device RNG folding for dropout/prior noise streams;
  * state buffers donated — no reallocation between steps;
  * bf16 compute under AMP with fp32 params and loss (no GradScaler:
    bf16 has fp32's exponent range, so the reference's scale/unscale
    machinery, train.py:218-225, has no TPU equivalent by design).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from clip_lite_tpu.parallel.collectives import axis_is_bound


class TrainState(struct.PyTreeNode):
    """Replicated training state pytree (the checkpointable unit)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, tx, sample_batch, seed: int = 0) -> TrainState:
    """Initialize model variables + optimizer state from a sample batch."""
    rngs = {
        "params": jax.random.PRNGKey(seed),
        "prior": jax.random.PRNGKey(seed + 1),
        "dropout": jax.random.PRNGKey(seed + 2),
    }
    variables = model.init(rngs, sample_batch, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def _fold_device_rng(rng: jax.Array, axis_name: str) -> jax.Array:
    """Give each device its own RNG stream inside shard_map."""
    if axis_is_bound(axis_name):
        rng = jax.random.fold_in(rng, lax.axis_index(axis_name))
    return rng


def _maybe_device_preprocess(batch, rng, train: bool):
    """If the host shipped uint8 images (the native/TPU-first pipeline),
    finish augmentation on device: random flip + color jitter + normalize.
    Keyed on dtype — static at trace time, zero cost for fp32 pipelines."""
    from clip_lite_tpu.ops.image_ops import device_preprocess

    out = dict(batch)
    for key in ("image", "neg_image", "aug_image"):
        if key in out and out[key].dtype == jnp.uint8:
            rng, sub = jax.random.split(rng)
            out[key] = device_preprocess(
                out[key], sub, flip=train, color_jitter=train)
    return out


def make_train_step(model, tx, data_axis: str = "data") -> Callable:
    """Build the per-shard train step (to be wrapped in shard_map + jit)."""

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        step_rng = _fold_device_rng(step_rng, data_axis)
        prior_rng, dropout_rng, aug_rng = jax.random.split(step_rng, 3)
        batch = _maybe_device_preprocess(batch, aug_rng, train=True)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, mutable=["batch_stats"],
                rngs={"prior": prior_rng, "dropout": dropout_rng})
            return out["loss"], (out["loss_components"],
                                 mutated.get("batch_stats", {}))

        (loss, (components, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        if axis_is_bound(data_axis):
            # ONE fused all-reduce for everything that crosses devices.
            # We compile with check_vma=False (manual-collectives mode), so
            # AD returns per-replica partial grads instead of inserting one
            # psum per parameter leaf; raveling grads + BN stats + metric
            # scalars and psumming the flat vectors costs three collectives
            # per step instead of ~200 small ones.  Fewer, larger
            # collectives is the idiomatic ICI pattern (and XLA's
            # all-reduce combiner can't always rescue per-leaf psums); on
            # the CPU validation mesh it's the difference between a 2 s
            # and a 40 s step (each in-process rendezvous costs ~0.2 s of
            # spin on low-core hosts).  Division by the axis size (not
            # pmean) yields the mean — caught by the ZeRO-1 equivalence
            # test if wrong.
            from jax.flatten_util import ravel_pytree

            n = lax.axis_size(data_axis)
            flat_g, unravel_g = ravel_pytree(grads)
            flat_s, unravel_s = ravel_pytree(new_stats)  # may be empty
            flat_c, unravel_c = ravel_pytree(components)
            reduced = lax.psum(
                tuple(v for v in (flat_g, flat_s, flat_c) if v.size),
                data_axis)
            it = iter(reduced)
            grads = unravel_g(next(it) / n)
            new_stats = unravel_s(next(it) / n) if flat_s.size else new_stats
            components = unravel_c(next(it) / n)

        from clip_lite_tpu.optim.fused import FusedOptimizer

        if isinstance(tx, FusedOptimizer):
            # Single fused traversal returns the new params directly and
            # reuses the clip norm as the grad_norm metric (the chain
            # path below pays a second full pass for it).
            new_params, new_opt_state, grad_norm = tx.apply(
                grads, state.opt_state, state.params)
        else:
            updates, new_opt_state = tx.update(
                grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: p + u,
                                      state.params, updates)
            grad_norm = optax_global_norm(grads)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = dict(components)
        metrics["grad_norm"] = grad_norm
        return new_state, metrics

    return train_step


def make_eval_step(model, data_axis: str = "data") -> Callable:
    """Validation step: loss components under eval-mode norms
    (the reference's val sweep, train.py:257-277)."""

    def eval_step(state: TrainState, batch, rng):
        step_rng = _fold_device_rng(jax.random.fold_in(rng, state.step),
                                    data_axis)
        prior_rng, dropout_rng, aug_rng = jax.random.split(step_rng, 3)
        batch = _maybe_device_preprocess(batch, aug_rng, train=False)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False,
            rngs={"prior": prior_rng, "dropout": dropout_rng})
        components = out["loss_components"]
        if axis_is_bound(data_axis):
            components = lax.pmean(components, data_axis)
        return components

    return eval_step


def optax_global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in jax.tree.leaves(tree)))


def make_scanned_train_step(model, tx, data_axis: str = "data",
                            steps_per_call: int = 1) -> Callable:
    """Device-side loop: one compiled call executes ``steps_per_call``
    train steps over a stacked batch pytree (leading dim = K).

    Amortizes per-dispatch host overhead K-fold (the classic TPU
    train-loop fusion; especially valuable on tunneled backends where a
    dispatch costs ~30 ms).  RNG streams stay correct: the base step
    folds the key with ``state.step``, which advances inside the scan.
    Returns the K-averaged loss components and the last grad_norm.
    """
    base = make_train_step(model, tx, data_axis)
    if steps_per_call <= 1:
        return base

    def scanned(state: TrainState, batches, rng):
        def body(carry, batch):
            new_state, metrics = base(carry, batch, rng)
            return new_state, metrics
        state, metrics = lax.scan(body, state, batches)
        out = jax.tree.map(lambda m: m.mean(), metrics)
        out["grad_norm"] = metrics["grad_norm"][-1]
        return state, out

    return scanned


def stack_batches(batches) -> Any:
    """Stack a list of batch dicts into one leading-K pytree."""
    import numpy as np

    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def compile_train_step(model, tx, mesh: Mesh, data_axis: str = "data",
                       donate: bool = True,
                       steps_per_call: int = 1) -> Callable:
    """jit(shard_map(train_step)) over the mesh: the deployable program.

    Donation is only enabled on real TPU platforms:
      * CPU: donated-buffer reuse serializes replica execution under
        XLA's in-process collectives — guaranteed rendezvous deadlock
        ("Termination timeout for collective permute ... 7 of 8 arrived");
      * axon (tunneled TPU): execution rejects donated programs with
        an opaque INVALID_ARGUMENT.
    See parallel.mesh.donation_supported.
    """
    from clip_lite_tpu.optim.fused import FusedOptimizer
    from clip_lite_tpu.parallel.mesh import donation_supported

    if not donation_supported(mesh):
        donate = False
    step = make_scanned_train_step(model, tx, data_axis, steps_per_call)
    donate_argnums = (0,) if donate else ()
    hoisted = isinstance(tx, FusedOptimizer) and tx.hoisted
    if mesh.devices.size == 1:
        # Single device: plain jit. Identical semantics (the data axis is
        # unbound, so collectives and the grad division no-op away) and it
        # avoids shard_map's sharded-dispatch path, which is pathologically
        # slow on tunneled backends (~250x observed).
        return _strip_slow(jax.jit(step, donate_argnums=donate_argnums),
                           hoisted)
    # Batches shard on their batch dim: axis 0 for single steps, axis 1
    # (after the leading K) for scanned multi-step calls.
    batch_spec = P(data_axis) if steps_per_call <= 1 \
        else P(None, data_axis)
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        # Manual-collectives mode: the step performs its own fused psum of
        # (grads, BN stats, metrics) — see make_train_step.  Under
        # check_vma=True AD would additionally insert one psum per
        # parameter leaf, defeating the fusion (and the replication of
        # outputs after an explicit psum is exactly what the checker
        # cannot prove — same reason zero1.py disables it).
        check_vma=False,
    )
    return _strip_slow(jax.jit(sharded, donate_argnums=donate_argnums),
                       hoisted)


def _strip_slow(compiled: Callable, hoisted: bool) -> Callable:
    """Hoisted-Lookahead mode: keep the slow tree OUT of the compiled
    step.

    ``FusedOptimizer.apply`` passes ``slow_params`` through untouched in
    hoisted mode, but without buffer donation (disabled on tunneled TPU
    and CPU meshes, parallel.mesh.donation_supported) XLA does not alias
    an untouched input to an output — every step would COPY the full
    slow tree (~450 kernels / 1.3 GB HBM traffic on the flagship, ~2 ms
    measured).  Here the slow leaves never enter the program: they are
    detached from the input state and re-attached to the output state in
    Python (pure pytree surgery, no device work), so the caller-visible
    contract — TrainState in, TrainState of the same structure out — is
    unchanged for the train loop, checkpointing, and the la_sync call.
    """
    if not hoisted:
        return compiled

    def call(state, batch, rng):
        slow = state.opt_state.slow_params
        lean = state.replace(
            opt_state=state.opt_state._replace(slow_params={}))
        new_lean, metrics = compiled(lean, batch, rng)
        new_state = new_lean.replace(
            opt_state=new_lean.opt_state._replace(slow_params=slow))
        return new_state, metrics

    # AOT surface for callers that pre-compile (the dryrun legs):
    # lower(...).compile() returns an executable with the SAME
    # full-state contract as ``call``.
    class _Lowered:
        def __init__(self, lowered):
            self._lowered = lowered

        def compile(self):
            exe = self._lowered.compile()

            def run(state, batch, rng):
                slow = state.opt_state.slow_params
                lean = state.replace(
                    opt_state=state.opt_state._replace(slow_params={}))
                new_lean, metrics = exe(lean, batch, rng)
                return new_lean.replace(
                    opt_state=new_lean.opt_state._replace(
                        slow_params=slow)), metrics

            return run

    def lower(state, batch, rng):
        lean = state.replace(
            opt_state=state.opt_state._replace(slow_params={}))
        return _Lowered(compiled.lower(lean, batch, rng))

    call.lower = lower
    return call


def compile_eval_step(model, mesh: Mesh, data_axis: str = "data") -> Callable:
    step = make_eval_step(model, data_axis)
    if mesh.devices.size == 1:
        return jax.jit(step)
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(data_axis), P()),
        out_specs=P(),
    )
    return jax.jit(sharded)
