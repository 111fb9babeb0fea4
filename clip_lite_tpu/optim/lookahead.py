"""Lookahead optimizer (k steps forward, 1 step back) as an optax wrapper.

Functional re-derivation of the Lookahead rule (Zhang et al., 2019;
reference: optim/lookahead.py:21-127 wraps a torch optimizer and mutates
``p.data`` in place every k steps).  Here it is a pure
``GradientTransformation`` that wraps any inner transformation: the slow
weights live in the optimizer state pytree, and every k-th update the
emitted update lands the fast weights on
``slow + alpha * (fast_new - slow)``, which then becomes the new slow
point.  Everything is branchless (jnp.where on a scalar), so the whole
train step stays a single compiled XLA program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class LookaheadState(NamedTuple):
    inner_state: optax.OptState
    slow_params: optax.Params
    step_count: jnp.ndarray


def lookahead(inner: optax.GradientTransformation, k: int = 5,
              alpha: float = 0.5) -> optax.GradientTransformation:
    """Wrap ``inner`` with Lookahead slow/fast weight interpolation."""

    def init_fn(params):
        return LookaheadState(
            inner_state=inner.init(params),
            # Copy, not alias: donated train steps delete their input
            # param buffers, and an aliased slow tree would die with them.
            slow_params=jax.tree.map(jnp.copy, params),
            step_count=jnp.zeros([], jnp.int32),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("lookahead requires params to be passed in.")
        updates, inner_state = inner.update(updates, state.inner_state, params)
        count = state.step_count + 1
        sync = (count % k == 0)

        def interp(p, u, slow):
            fast_new = p + u
            synced = slow + alpha * (fast_new - slow)
            new_u = jnp.where(sync, synced - p, u)
            new_slow = jnp.where(sync, synced, slow)
            return new_u, new_slow

        flat = jax.tree.map(interp, params, updates, state.slow_params)
        new_updates = jax.tree.map(lambda t: t[0], flat,
                                   is_leaf=lambda t: isinstance(t, tuple))
        new_slow = jax.tree.map(lambda t: t[1], flat,
                                is_leaf=lambda t: isinstance(t, tuple))
        return new_updates, LookaheadState(inner_state, new_slow, count)

    return optax.GradientTransformation(init_fn, update_fn)


def slow_params_from_state(opt_state,
                           params: Optional[optax.Params] = None
                           ) -> Optional[optax.Params]:
    """Extract Lookahead slow weights for evaluation (the reference's
    ``load_slow_weights``, optim/lookahead.py:103-116).  Returns None if no
    Lookahead state is present.  Handles the optax-chain LookaheadState
    (pytree slow weights), the fused optimizer's FusedOptState, and the
    ZeRO-1 Zero1State (both keep a flat fp32 slow vector — pass ``params``
    to unravel it back into the parameter structure; Zero1State's is
    zero-padded to the mesh-divisible length and gets truncated)."""
    # Lazy imports: optim/__init__ re-exports this module, and zero1
    # imports optim — importing Zero1State at module scope would cycle.
    from clip_lite_tpu.optim.fused import FusedOptState
    from clip_lite_tpu.parallel.zero1 import Zero1State

    found = []

    def _unravel_flat(vec):
        from jax.flatten_util import ravel_pytree

        flat, unravel = ravel_pytree(params)
        return unravel(vec[:flat.shape[0]])

    def visit(s):
        if isinstance(s, LookaheadState):
            found.append(s.slow_params)
        elif isinstance(s, FusedOptState):
            sp = s.slow_params
            if isinstance(sp, dict) and not sp:
                return  # lookahead disabled
            if params is not None and not isinstance(sp, dict):
                # Flat (N,) slow vector: unravel via the params structure.
                sp = _unravel_flat(sp)
            found.append(sp)
        elif isinstance(s, Zero1State):
            sp = s.slow_params
            # create_zero1_opt_state stores all-zeros when Lookahead is
            # off; a real slow vector is never identically zero (it starts
            # as a copy of the params).
            if not bool(jax.device_get(jnp.any(sp != 0))):
                return
            found.append(_unravel_flat(sp) if params is not None else sp)
        elif isinstance(s, tuple):
            for item in s:
                visit(item)

    visit(opt_state)
    return found[0] if found else None
