"""Pretraining driver: JSD InfoMax training of the two-tower model.

Equivalent of the reference's train.py (reference: train.py:62-313), as a
single-controller SPMD program:

  * no process spawn / NCCL rendezvous — one Python process drives the
    whole mesh (reference L1, utils/distributed.py, dissolves);
  * the hot loop body is ONE compiled XLA program (forward+backward+
    allreduce+clip+SGD+Lookahead+schedule);
  * val sweeps every --checkpoint-every, with cross-device metric pmean
    inside the compiled eval step;
  * "climax" dense model-only checkpointing in the last 20% of training
    (reference: train.py:290-296);
  * mid-training switch to the cluster hard-negative dataloader
    (reference: train.py:151-163,196-208) — the new batch dict triggers
    one recompile, then steady state again.

Run (synthetic smoke):
    python -m clip_lite_tpu.train \
        --config-override MODEL.NAME random OPTIM.NUM_ITERATIONS 100
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict

import jax
import numpy as np

from clip_lite_tpu.config import Config
from clip_lite_tpu.engine import (
    compile_eval_step,
    compile_train_step,
    create_train_state,
)
from clip_lite_tpu.factories import (
    NegativeSamplingDatasetFactory,
    OptimizerFactory,
    PretrainingDatasetFactory,
    PretrainingModelFactory,
)
from clip_lite_tpu.data.pipeline import DataLoader, infinite_batches
from clip_lite_tpu.parallel import create_mesh, shard_batch
from clip_lite_tpu.utils.checkpointing import CheckpointManager
from clip_lite_tpu.utils.common import (
    apply_platform_args,
    common_parser,
    common_setup,
)
from clip_lite_tpu.utils.timers import Timer, device_mem_usage_mb

parser = common_parser(description="Pretrain the VLInfo two-tower model.")
group = parser.add_argument_group("Checkpointing and Logging")
group.add_argument("--resume-from", default=None,
                   help="Checkpoint path to resume from.")
group.add_argument("--checkpoint-every", type=int, default=10000)
group.add_argument("--log-every", type=int, default=500)
group.add_argument("--climax-freq", type=int, default=1000,
                   help="Checkpoint frequency in the last 20%% of training.")
group.add_argument("--keep-recent", type=int, default=100)
group.add_argument("--profile-dir", default=None,
                   help="Capture a jax.profiler trace of a few steady-state "
                        "steps into this directory (view with TensorBoard / "
                        "xprof).")


def init_dataloaders(_C, _A, mesh, kind: str = "normal",
                     train_put: bool = True):
    """Build train/val loaders (reference: train.py:62-117).  Cluster mode
    halves the batch: each item carries a positive AND a hard negative.
    train_put=False keeps train batches on host (the scanned multi-step
    path stacks K of them before one device placement)."""
    if kind == "normal":
        train_ds = PretrainingDatasetFactory.from_config(_C, split="train")
        val_ds = PretrainingDatasetFactory.from_config(_C, split="val")
        batch_size = _C.OPTIM.BATCH_SIZE
    else:
        train_ds = NegativeSamplingDatasetFactory.from_config(_C, split="train")
        val_ds = NegativeSamplingDatasetFactory.from_config(_C, split="val")
        batch_size = _C.OPTIM.BATCH_SIZE // 2

    put = lambda b: shard_batch(b, mesh, _C.PARALLEL.DATA_AXIS)
    train_putter = put if train_put else None
    # On CPU backends host threads starve XLA's in-process collective
    # rendezvous; load synchronously there (see data/pipeline.py).
    background = mesh.devices.flat[0].platform != "cpu"
    train_loader = DataLoader(
        train_ds, batch_size, shuffle=True, drop_last=True,
        num_workers=_A.cpu_workers, seed=_C.RANDOM_SEED,
        prefetch=_C.DATA.PREFETCH, device_put_fn=train_putter,
        background=background,
        length_group_batches=(_C.DATA.LENGTH_GROUP_BATCHES
                              if _C.DATA.SEQ_BUCKETS else 0))
    val_loader = DataLoader(
        val_ds, batch_size, shuffle=False, drop_last=True,
        num_workers=_A.cpu_workers, seed=_C.RANDOM_SEED,
        prefetch=_C.DATA.PREFETCH, device_put_fn=put, background=background)
    return train_loader, val_loader


def crossed_interval(iteration: int, interval: int,
                     steps_per_call: int = 1) -> bool:
    """True iff a multiple of ``interval`` lies in the half-open window
    ``(iteration - steps_per_call, iteration]`` — i.e. the compiled call
    that just finished crossed a cadence boundary.

    With ``steps_per_call == 1`` this is exactly the reference's modulo
    check ``iteration % interval == 0`` (reference: train.py:230,250,290).
    With K > 1 the loop only observes every K-th iteration, so a plain
    modulo test silently skips every boundary K does not divide — no
    checkpoints, no val sweeps, no logs for the whole run.
    """
    return iteration % interval < steps_per_call


def main(_A) -> None:
    apply_platform_args(_A)
    _C = Config(_A.config, list(_A.config_override))
    logger = common_setup(_C, _A, job_type="pretrain")

    mesh = create_mesh(_C.PARALLEL.NUM_DEVICES, _C.PARALLEL.DATA_AXIS)
    n_dev = mesh.devices.size
    logger.info("Mesh: %d x %s devices; global batch %d (%d/device)",
                n_dev, mesh.devices.flat[0].platform,
                _C.OPTIM.BATCH_SIZE, _C.OPTIM.BATCH_SIZE // n_dev)
    if _C.OPTIM.BATCH_SIZE % n_dev:
        raise ValueError("OPTIM.BATCH_SIZE must divide the device count")

    model = PretrainingModelFactory.from_config(_C)
    # Hoisted Lookahead: on TPU, keep the sync out of the hot step and run
    # it as a separate compiled call every k-th iteration — without buffer
    # donation the in-step cond's identity branch copies params + slow
    # weights every step (optim/fused.py build_fused_optimizer docstring).
    la_cfg = _C.OPTIM.LOOKAHEAD
    hoist_la = (_C.OPTIM.FUSED and la_cfg.USE
                and max(1, _C.PARALLEL.STEPS_PER_CALL) == 1
                and not (_C.PARALLEL.ZERO1 and n_dev > 1)
                and mesh.devices.flat[0].platform == "tpu")
    tx = OptimizerFactory.from_config(_C, hoist_lookahead=hoist_la)
    if hoist_la:
        from clip_lite_tpu.optim.fused import build_lookahead_sync
        from clip_lite_tpu.parallel.mesh import donation_supported

        la_sync = build_lookahead_sync(_C, donate=donation_supported(mesh))
        logger.info("Lookahead sync hoisted out of the step program "
                    "(separate call every %d iterations)", la_cfg.STEPS)

    use_clusters = "clusters" in _C.DATA.NEGATIVE_SAMPLING
    switch_iter = _C.DATA.NEGATIVE_SAMPLING_START_ITERATION

    steps_per_call = max(1, _C.PARALLEL.STEPS_PER_CALL)
    use_zero1 = bool(_C.PARALLEL.ZERO1)
    if use_zero1 and steps_per_call > 1:
        raise ValueError("PARALLEL.ZERO1 is incompatible with "
                         "PARALLEL.STEPS_PER_CALL > 1")
    if _C.DATA.SEQ_BUCKETS and steps_per_call > 1:
        raise ValueError("DATA.SEQ_BUCKETS is incompatible with "
                         "PARALLEL.STEPS_PER_CALL > 1 (stacked batches "
                         "must share one compiled shape)")
    if use_zero1 and n_dev == 1:
        logger.warning("PARALLEL.ZERO1 on a single-device mesh shards "
                       "nothing; using the replicated update instead")
        use_zero1 = False
    use_device_cache = bool(_C.DATA.DEVICE_CACHE)
    if use_device_cache and (use_clusters or steps_per_call > 1):
        raise ValueError("DATA.DEVICE_CACHE is incompatible with cluster "
                         "negative sampling and STEPS_PER_CALL > 1")
    if use_device_cache and _C.MODEL.TEXTUAL.SELF_SUPERVISED:
        raise ValueError("DATA.DEVICE_CACHE has no augmented-caption "
                         "stream (visual SSL is supported on-device; "
                         "textual SSL needs the host loader)")

    # Decide the curriculum phase BEFORE building any loader: resume peeks
    # only the stored iteration (reference: train.py:151-163 decides the
    # phase after a full load; here the loaders are built exactly once).
    start_iteration = 0
    kind = "normal"
    if _A.resume_from:
        from clip_lite_tpu.utils.checkpointing import peek_iteration

        start_iteration = peek_iteration(_A.resume_from)
        if use_clusters and start_iteration >= switch_iter:
            kind = "clusters"

    train_loader, val_loader = init_dataloaders(
        _C, _A, mesh, kind, train_put=(steps_per_call == 1))
    if use_device_cache:
        from clip_lite_tpu.data.device_cache import DeviceDataCache

        cache = DeviceDataCache(
            train_loader.dataset, mesh, _C.OPTIM.BATCH_SIZE,
            _C.PARALLEL.DATA_AXIS, cache_size=_C.DATA.CACHE_IMAGE_SIZE,
            crop_size=_C.DATA.IMAGE_CROP_SIZE,
            seq_buckets=_C.DATA.SEQ_BUCKETS, seed=_C.RANDOM_SEED,
            placement=_C.DATA.CACHE_PLACEMENT,
            ssl_aug=_C.MODEL.VISUAL.SELF_SUPERVISED,
            host_cache_dir=_C.DATA.CACHE_HOST_DIR)
        cache.set_start(start_iteration)
        batches = iter(cache)
        logger.info("Device-resident dataset cache (%s): %d items, "
                    "%.2f GB total / %.2f GB per chip; host pipeline "
                    "out of the loop", cache.placement,
                    len(train_loader.dataset),
                    cache.memory_bytes() / 1e9,
                    cache.memory_bytes_per_device() / 1e9)
    else:
        batches = infinite_batches(train_loader, start_iteration)
    first_batch = next(batches)

    state = create_train_state(model, tx, first_batch, seed=_C.RANDOM_SEED)
    if (_C.MODEL.VISUAL.PRETRAINED and _C.MODEL.VISUAL.PRETRAINED_PATH) or \
            (_C.MODEL.TEXTUAL.PRETRAINED and _C.MODEL.TEXTUAL.PRETRAINED_PATH):
        from clip_lite_tpu.models.pretrained import apply_pretrained_weights

        variables = apply_pretrained_weights(
            {"params": state.params, "batch_stats": state.batch_stats}, _C)
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"],
                              opt_state=tx.init(variables["params"]))
    if use_zero1:
        from clip_lite_tpu.parallel.zero1 import create_zero1_opt_state

        state = state.replace(opt_state=create_zero1_opt_state(
            state.params, mesh, _C.PARALLEL.DATA_AXIS,
            use_lookahead=_C.OPTIM.LOOKAHEAD.USE))
        logger.info("ZeRO-1 weight-update sharding: optimizer state "
                    "1/%d per device", n_dev)
    n_params = sum(int(np.prod(x.shape)) for x in
                   jax.tree.leaves(state.params))
    logger.info("Model: %s + %s | %.2fM params",
                _C.MODEL.VISUAL.NETWORK_NAME, _C.MODEL.TEXTUAL.NAME,
                n_params / 1e6)

    ckpt_dir = (_A.checkpoints_dir or _A.serialization_dir) + _C.RUN_ID
    # Async saves on TPU: the fetch/serialize/write of the ~GB-scale
    # state runs on a worker thread so the hot loop never stalls on
    # checkpoint cadence.  Sync on CPU meshes (host threads starve XLA's
    # in-process collectives, see data/pipeline.py).
    manager = CheckpointManager(
        ckpt_dir, keep_recent=_A.keep_recent,
        async_writes=(mesh.devices.flat[0].platform == "tpu"),
        state=state)
    if _A.resume_from:
        loaded_iteration = manager.load(_A.resume_from)
        assert loaded_iteration == start_iteration  # peeked above
        state = manager.restored("state")
        logger.info("Resumed from %s at iteration %d (%s phase)",
                    _A.resume_from, start_iteration, kind)

    if use_zero1:
        from clip_lite_tpu.parallel.zero1 import compile_zero1_train_step

        train_step = compile_zero1_train_step(
            model, _C, mesh, state.params, data_axis=_C.PARALLEL.DATA_AXIS)
    else:
        train_step = compile_train_step(model, tx, mesh,
                                        _C.PARALLEL.DATA_AXIS,
                                        donate=_C.PARALLEL.DONATE,
                                        steps_per_call=steps_per_call)
    eval_step = compile_eval_step(model, mesh, _C.PARALLEL.DATA_AXIS)
    rng = jax.random.PRNGKey(_C.RANDOM_SEED)

    if steps_per_call > 1:
        from clip_lite_tpu.engine import stack_batches
        from clip_lite_tpu.parallel.mesh import shard_stacked_batch

        def next_train_input(first=None):
            """Stack K host batches into one device placement."""
            host = [first] if first is not None else [next(batches)]
            while len(host) < steps_per_call:
                host.append(next(batches))
            return shard_stacked_batch(stack_batches(host), mesh,
                                       _C.PARALLEL.DATA_AXIS)
    else:
        def next_train_input(first=None):
            return first if first is not None else next(batches)

    sync_steps = mesh.devices.flat[0].platform == "cpu"
    timer = Timer(start_from=start_iteration + 1,
                  total_iterations=_C.OPTIM.NUM_ITERATIONS)
    from clip_lite_tpu.utils.loggers import MetricsWriter

    writer = MetricsWriter(_A.serialization_dir, config=_C._C.to_dict())
    batch = next_train_input(first_batch)

    profiling = False
    iteration = start_iteration
    while iteration < _C.OPTIM.NUM_ITERATIONS:
        iteration += steps_per_call
        if _A.profile_dir and not profiling and \
                iteration - start_iteration >= 3 * steps_per_call:
            # Trace a few steady-state (post-compile) steps.
            jax.profiler.start_trace(_A.profile_dir)
            profiling = True
            profile_stop_at = iteration + 5 * steps_per_call
        # Mid-training hard-negative curriculum switch.
        if use_clusters and kind == "normal" and iteration >= switch_iter:
            logger.info("Switching to clustered hard-negative sampling "
                        "(iteration %d)", iteration)
            kind = "clusters"
            train_loader, val_loader = init_dataloaders(
                _C, _A, mesh, kind, train_put=(steps_per_call == 1))
            batches = infinite_batches(train_loader, iteration)
            batch = next_train_input()

        timer.tic()
        state, metrics = train_step(state, batch, rng)
        if hoist_la and iteration % la_cfg.STEPS == 0:
            p, s = la_sync(state.params, state.opt_state.slow_params)
            state = state.replace(
                params=p, opt_state=state.opt_state._replace(slow_params=s))
        if sync_steps:
            jax.block_until_ready(state)
        batch = next_train_input()  # overlap host fetch with device step
        if profiling and iteration >= profile_stop_at:
            jax.block_until_ready(state)
            jax.profiler.stop_trace()
            profiling = False
            _A.profile_dir = None
            logger.info("Profiler trace written (steps %d..%d)",
                        profile_stop_at - 5 * steps_per_call, iteration)
        log_now = crossed_interval(iteration, _A.log_every, steps_per_call)
        if log_now:
            metrics = jax.tree.map(float, jax.device_get(metrics))
        timer.toc()
        timer.current_iter = iteration + 1  # K iterations per call

        if log_now:
            logger.info("%s | loss %.3f (xm %.3f) | gnorm %.2f | mem %d MB",
                        timer.stats, metrics["total_loss"],
                        metrics["cross_modal_loss"], metrics["grad_norm"],
                        device_mem_usage_mb())
            writer.write(iteration, metrics, split="train")

        if crossed_interval(iteration, _A.checkpoint_every, steps_per_call):
            # Val sweep (reference: train.py:257-288). Each batch folds
            # its index into the key so prior-noise draws differ across
            # the sweep (state.step alone is constant during it).
            val_sums: Dict[str, float] = {}
            n_batches = 0
            for val_batch in val_loader:
                batch_rng = jax.random.fold_in(rng, n_batches)
                comps = jax.device_get(eval_step(state, val_batch, batch_rng))
                for k, v in comps.items():
                    val_sums[k] = val_sums.get(k, 0.0) + float(v)
                n_batches += 1
            if n_batches:
                val_means = {k: v / n_batches for k, v in val_sums.items()}
                logger.info("VAL @ %d: %s", iteration,
                            {k: round(v, 4) for k, v in val_means.items()})
                writer.write(iteration, val_means, split="val")
                metric = val_means.get("total_loss")
            else:
                metric = None
            manager.checkpointables["state"] = state
            manager.step(iteration, metric=metric)

        # Dense "climax" checkpointing in the last 20% (train.py:290-296).
        if (iteration / _C.OPTIM.NUM_ITERATIONS) > 0.8 and \
                crossed_interval(iteration, _A.climax_freq, steps_per_call):
            manager.checkpointables["state"] = state
            manager.climax_step(iteration)

    # Final checkpoint so short runs always leave an artifact.
    manager.checkpointables["state"] = state
    manager.step(_C.OPTIM.NUM_ITERATIONS)
    manager.wait()  # drain the async writer before declaring done
    writer.close()
    logger.info("Done: %d iterations.", _C.OPTIM.NUM_ITERATIONS)


if __name__ == "__main__":
    main(parser.parse_args())
