"""Optimizer construction: torch-semantics SGD/AdamW with per-group LRs,
global-norm clipping, warmup schedules, and Lookahead.

Reproduces the reference's update pipeline ordering exactly
(reference: train.py:218-226 + factories.py:437-487):
    clip global norm -> inner step (coupled-L2 SGD / decoupled AdamW,
    per-param-group LR x schedule multiplier) -> Lookahead sync every k.

Param-group mapping (reference: factories.py:464-475): paths under the
image tower get ``CNN_LR``, paths under the text tower ``TRANS_LR``,
everything else ``LR``.  The NO_DECAY regex is matched against dotted
parameter paths.  (Reference quirk, preserved: the default pattern
``.*textual.(...)`` matches no actual parameter path, so weight decay
applies everywhere unless the user supplies a matching pattern.)
"""

from __future__ import annotations

import re
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from clip_lite_tpu.optim import schedules  # noqa: F401
from clip_lite_tpu.optim.lookahead import (  # noqa: F401
    LookaheadState,
    lookahead,
    slow_params_from_state,
)


def param_paths(params) -> list:
    """Dotted path strings for every leaf, torch-ish naming."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [_path_str(kp) for kp, _ in flat]


def _path_str(keypath) -> str:
    parts = []
    for k in keypath:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return ".".join(parts)


def _tree_from_paths(params, fn: Callable[[str], object]):
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: fn(_path_str(kp)), params)


def make_lr_tree_fn(cnn_lr: float, trans_lr: float, base_lr: float):
    """path -> peak LR, per the reference's group rule."""

    def lr_for(path: str) -> float:
        if "image_encoder" in path:
            return cnn_lr
        if "text_encoder" in path:
            return trans_lr
        return base_lr

    return lr_for


def scale_by_group_lr(lr_for: Callable[[str], float],
                      schedule_fn) -> optax.GradientTransformation:
    """Final descent scaling: update *= -peak_lr(path) * schedule(step)."""

    def init_fn(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        mult = schedule_fn(state.count)
        new_updates = jax.tree_util.tree_map_with_path(
            lambda kp, u: u * (-lr_for(_path_str(kp)) * mult), updates)
        return new_updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(config, schedule_fn=None) -> optax.GradientTransformation:
    """Build the full chain from a :class:`~clip_lite_tpu.config.Config`."""
    from clip_lite_tpu.factories import LRSchedulerFactory

    _C = config
    if schedule_fn is None:
        schedule_fn = LRSchedulerFactory.from_config(_C)

    no_decay_re = re.compile(_C.OPTIM.NO_DECAY) if _C.OPTIM.NO_DECAY else None

    def decay_mask(params):
        def decays(path: str) -> bool:
            return not (no_decay_re and no_decay_re.match(path))
        return _tree_from_paths(params, decays)

    lr_for = make_lr_tree_fn(_C.OPTIM.CNN_LR, _C.OPTIM.TRANS_LR, _C.OPTIM.LR)
    wd = _C.OPTIM.WEIGHT_DECAY

    parts = []
    if _C.OPTIM.CLIP_GRAD_NORM and _C.OPTIM.CLIP_GRAD_NORM > 0:
        parts.append(optax.clip_by_global_norm(_C.OPTIM.CLIP_GRAD_NORM))

    name = _C.OPTIM.OPTIMIZER_NAME
    if name == "sgd":
        # torch SGD: coupled L2 (grad += wd*p) before the momentum buffer.
        if wd:
            parts.append(optax.add_decayed_weights(wd, mask=decay_mask))
        if _C.OPTIM.SGD_MOMENTUM:
            parts.append(optax.trace(decay=_C.OPTIM.SGD_MOMENTUM))
    elif name == "adamw":
        # torch AdamW: adam moments on raw grad, decoupled wd scaled by lr.
        parts.append(optax.scale_by_adam())
        if wd:
            parts.append(optax.add_decayed_weights(wd, mask=decay_mask))
    else:
        raise KeyError(f"Unknown optimizer {name!r}")

    parts.append(scale_by_group_lr(lr_for, schedule_fn))
    tx = optax.chain(*parts)

    if _C.OPTIM.LOOKAHEAD.USE:
        tx = lookahead(tx, k=_C.OPTIM.LOOKAHEAD.STEPS,
                       alpha=_C.OPTIM.LOOKAHEAD.ALPHA)
    return tx
