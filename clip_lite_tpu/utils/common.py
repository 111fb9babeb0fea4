"""Common setup and CLI plumbing shared by all drivers.

Equivalent of the reference's utils/common.py: seeding + serialization-dir
setup (common_setup, :41-103) and the shared argparse surface
(common_parser, :106-159), minus the per-GPU process launch machinery —
JAX is single-controller, so there is nothing to spawn.
"""

from __future__ import annotations

import argparse
import logging
import os
import random
import sys

import numpy as np


def common_parser(description: str = "") -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--config", default=None,
                        help="Path to a config YAML (merged over defaults).")
    parser.add_argument(
        "--config-override", nargs="*", default=[],
        help="Dotted key-value pairs to override, e.g. OPTIM.BATCH_SIZE 512")
    parser.add_argument("--serialization-dir", default="/tmp/clip_lite_tpu",
                        help="Directory for checkpoints, logs, config dump.")
    parser.add_argument("--checkpoints-dir", default=None,
                        help="Alias of --serialization-dir (reference CLI).")
    parser.add_argument("--num-devices", type=int, default=0,
                        help="Devices on the data axis; 0 = all local.")
    parser.add_argument("--cpu-workers", type=int, default=4,
                        help="Host-side data workers.")
    parser.add_argument("--platform", default=None,
                        choices=["cpu", "tpu", "axon"],
                        help="Force a JAX platform (e.g. cpu for smoke runs).")
    parser.add_argument("--virtual-devices", type=int, default=0,
                        help="With --platform cpu: number of virtual CPU "
                             "devices (to exercise the mesh without TPUs).")
    # Multi-host launch surface (the reference's --num-machines /
    # --machine-rank / --dist-url, reference: utils/distributed.py:63,98).
    # On TPU pods all three are auto-detected; pass them explicitly for
    # other fabrics.
    parser.add_argument("--num-hosts", type=int, default=1,
                        help="Number of participating host processes; >1 "
                             "triggers jax.distributed.initialize.")
    parser.add_argument("--host-rank", type=int, default=None,
                        help="This process' index in [0, num_hosts).")
    parser.add_argument("--coordinator-address", default=None,
                        help="host:port of process 0 for the DCN rendezvous "
                             "(the reference's --dist-url).")
    return parser


def apply_platform_args(args) -> None:
    """Apply --platform/--virtual-devices and the multi-host rendezvous
    before any JAX computation.

    Must run before the first backend initialization; works even though
    the ambient sitecustomize imports jax with JAX_PLATFORMS=axon."""
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "num_hosts", 1) > 1:
        from clip_lite_tpu.parallel.distributed import initialize_multihost

        initialize_multihost(args.coordinator_address, args.num_hosts,
                             args.host_rank)
    if args.virtual_devices and args.platform == "cpu":
        jax.config.update("jax_num_cpu_devices", args.virtual_devices)
        # XLA:CPU's in-process collectives abort the whole process if any
        # replica thread misses the 40 s rendezvous window; on low-core
        # hosts the async-dispatch thread racing the replica threads is
        # enough to trip it (observed on a 1-core box).  Synchronous
        # dispatch removes that thread — same mitigation as
        # __graft_entry__._dryrun_leg.
        jax.config.update("jax_cpu_enable_async_dispatch", False)
    # Persistent compilation cache: the training step contains Pallas
    # (Mosaic) kernels whose first compile costs minutes through the
    # remote-compile tunnel; cached recompiles are sub-second.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       "/tmp/clip_lite_jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def common_setup(config, args, job_type: str = "pretrain") -> logging.Logger:
    """Seed everything, create the serialization dir, dump the config,
    configure logging to stdout + a per-host file.

    Multi-host: the config dump is primary-host-only (the reference's
    master-only writes, train.py:251-255); each host keeps its OWN log
    file, suffixed with its process index (the reference's per-rank
    loguru files, utils/common.py:83-95)."""
    random.seed(config.RANDOM_SEED)
    np.random.seed(config.RANDOM_SEED)
    apply_rng_impl(config)

    from clip_lite_tpu.parallel.distributed import (
        is_primary_host,
        process_count,
        process_index,
    )

    ser_dir = args.checkpoints_dir or args.serialization_dir
    args.serialization_dir = ser_dir
    os.makedirs(ser_dir, exist_ok=True)
    if is_primary_host():
        config.dump(os.path.join(ser_dir, f"{job_type}_config.yaml"))

    logger = logging.getLogger("clip_lite_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "%(asctime)s | %(levelname)s | %(message)s", "%Y-%m-%d %H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    suffix = f"_h{process_index()}" if process_count() > 1 else ""
    fh = logging.FileHandler(
        os.path.join(ser_dir, f"log_{job_type}{suffix}.txt"))
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.propagate = False
    return logger


def apply_rng_impl(config) -> None:
    """Select the device PRNG implementation (config RNG_IMPL).  rbg's
    XLA-native bit generation is measurably faster than threefry for
    dropout-heavy steps on TPU; keys/fold_in/split semantics are
    unchanged, only the drawn bits differ."""
    impl = getattr(config, "RNG_IMPL", None) or "threefry"
    if impl not in ("threefry", "rbg"):
        raise ValueError(f"Unknown RNG_IMPL {impl!r}")
    if impl != "threefry":
        import jax

        jax.config.update("jax_default_prng_impl", impl)


def cycle(loader, start_iteration: int = 0):
    """Infinite batch generator over an (epoch-aware) loader
    (reference: utils/common.py:14-38).  Loaders expose ``set_epoch`` for
    reshuffling and, for curriculum datasets, ``set_iteration``."""
    epoch = 0
    iteration = start_iteration
    while True:
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(epoch)
        for batch in loader:
            if hasattr(loader, "set_iteration"):
                loader.set_iteration(iteration)
            iteration += 1
            yield batch
        epoch += 1
