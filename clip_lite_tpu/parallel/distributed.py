"""Multi-host initialization and process-level helpers.

The reference's process layer spawns one NCCL process per GPU with a TCP
rendezvous (reference: utils/distributed.py:15-113).  JAX is
single-controller per host: one Python process drives all local chips,
and ``jax.distributed.initialize`` performs the cross-host (DCN)
rendezvous.  In-program collectives then ride ICI (see collectives.py);
the reference's barrier/allreduce helpers dissolve into SPMD program
order and pmean.
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger("clip_lite_tpu")


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize cross-host JAX (no-op on a single host).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly for other fabrics (the analog of the reference's
    --dist-url/--machine-rank CLI, utils/distributed.py:63,98).
    """
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception as e:  # single-host / no coordinator: fine
            logger.info("Single-host run (%s)", type(e).__name__)
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    logger.info("Multi-host JAX: process %d/%d",
                jax.process_index(), jax.process_count())


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    """Number of participating host processes (the reference's
    get_world_size is devices; this is machines,
    utils/distributed.py:122-129)."""
    import jax

    return jax.process_count()


def is_primary_host() -> bool:
    """Whether this is host 0 (the reference's is_master_process,
    utils/distributed.py:132-138). Host-side IO (checkpoints, logs)
    should run here on multi-host setups."""
    return process_index() == 0