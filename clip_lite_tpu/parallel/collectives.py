"""Collective helpers used inside the SPMD (shard_map) training step.

The reference's communication layer is NCCL: DDP gradient allreduce plus
explicit ``dist.all_reduce`` for metric averaging
(reference: utils/distributed.py:141-159, train.py:176-178).  Here the
equivalents are XLA collectives over ICI, called from inside a
``shard_map``-decorated step: ``psum``/``pmean`` for grads and metrics, and
a single-row ``ppermute`` that turns the contrastive loss's roll-by-one
negative pairing into a *global-batch* roll across devices.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def axis_is_bound(axis_name: Optional[str]) -> bool:
    """True if ``axis_name`` is bound in the current trace (i.e. we are
    inside shard_map/vmap with that axis)."""
    if not axis_name:
        return False
    try:
        lax.axis_size(axis_name)
        return True
    except NameError:
        return False


def pmean_if_bound(x, axis_name: Optional[str]):
    """pmean over the axis when bound; identity otherwise.

    Replaces the reference's ``average_across_processes``
    (utils/distributed.py:141-159) — but rides ICI inside the compiled
    program instead of a host-driven NCCL allreduce.
    """
    if axis_is_bound(axis_name):
        return lax.pmean(x, axis_name)
    return x


def roll_shifted_left(x: jax.Array, axis_name: Optional[str], scope: str) -> jax.Array:
    """Shift a batch left by one position: out[i] = x[i+1 mod B].

    This is the negative-pair construction of the JSD loss
    (reference: loss.py:214-216, ``cat((t[1:], t[0:1]))``).

    scope == "local":  roll within this device's shard only — exact
        behavioral parity with the reference, where DDP ranks never
        exchange negatives (SURVEY.md section 3.2).
    scope == "global": roll across the *global* batch.  Each device
        performs the local shift and then replaces its last row with the
        next device's first row via a one-row ``ppermute`` — an O(D)
        transfer per device over ICI, giving every positive a negative
        drawn from the global batch.
    """
    if x.shape[0] < 1:
        return x
    local = jnp.concatenate([x[1:], x[:1]], axis=0)
    if scope == "local" or not axis_is_bound(axis_name):
        return local
    if scope != "global":
        raise ValueError(f"Unknown negatives scope {scope!r}")
    n = lax.axis_size(axis_name)
    if n == 1:
        return local
    # Send my first row to the previous device on the ring; receive the
    # next device's first row and place it at my last position.
    perm = [(i, (i - 1) % n) for i in range(n)]
    incoming_first = lax.ppermute(x[:1], axis_name, perm)
    return jnp.concatenate([x[1:], incoming_first], axis=0)
