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
            slow_params=jax.tree.map(jnp.asarray, params),
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
    Lookahead state is present.  Handles both the optax-chain
    LookaheadState (pytree slow weights) and the fused optimizer's
    FusedOptState (flat slow vector — pass ``params`` to unravel it back
    into the parameter structure)."""
    from clip_lite_tpu.optim.fused import FusedOptState

    found = []

    def visit(s):
        if isinstance(s, LookaheadState):
            found.append(s.slow_params)
        elif isinstance(s, FusedOptState):
            sp = s.slow_params
            if isinstance(sp, dict) and not sp:
                return  # lookahead disabled
            if params is not None and not isinstance(sp, dict):
                # Flat (N,) slow vector (e.g. a ZeRO-1-style flat state):
                # unravel via the params structure.
                from jax.flatten_util import ravel_pytree

                sp = ravel_pytree(params)[1](sp)
            found.append(sp)
        elif isinstance(s, tuple):
            for item in s:
                visit(item)

    visit(opt_state)
    return found[0] if found else None
