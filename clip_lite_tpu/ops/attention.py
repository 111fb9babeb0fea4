"""Fused multi-head self-attention for short sequences (Pallas, TPU).

Why this exists: the flagship text tower (BERT-12 over 30-token captions,
reference configs/done/fs_bs1024_ni250k.yaml) spends ~9 ms/step of its
29 ms in attention — not in FLOPs (the per-head (30,30) einsums are <1 GF)
but in *kernel count*: XLA emits ~30 ops per layer-direction for the
reshape/transpose/scale/mask/softmax/dropout/convert chain around two tiny
batched matmuls, each op paying fixed launch + HBM round-trip cost.  This
module collapses the whole block (scores, mask, softmax, dropout, context)
into ONE Pallas kernel per direction, with a flash-attention-style
recompute backward (no saved probabilities) and on-core PRNG dropout.

Semantics match the unfused path in ``models/bert.py`` (additive mask of
``finfo(f32).min * 0.5``, fp32 softmax, bf16 context matmul) except the
dropout mask stream: the kernel draws TPU-core PRNG bits instead of
``jax.random.bernoulli``, so masks differ draw-for-draw (training
statistics are equivalent — the same trade the rbg PRNG default makes,
see docs/PERF_NOTES.md).  Set ``MODEL.TEXTUAL.FUSED_ATTENTION false``
(config.py, plumbed through TextualHeadFactory) for bit-compatibility
with the XLA path.

Layout contract: q/k/v arrive packed as the raw fused-QKV activation
(B, S, 3*NH*HD) — head h of q/k/v lives in lanes [h*HD, (h+1)*HD) of the
q/k/v third — and the context leaves as (B, S, NH*HD).  No (B,NH,S,HD)
transposes ever materialize in HBM.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = float(np.finfo(np.float32).min) * 0.5


def _pick_batch_block(batch: int, seq: int, three_h: int,
                      itemsize: int, bias_full_heads: int = 0) -> int:
    """Largest power-of-two batch block dividing ``batch`` that keeps the
    working set inside VMEM (~16MB/core on v4/v5e).

    Counts the real working set, not just the QKV input: the Pallas
    pipeline double-buffers every in/out block, and the kernel holds ~5
    live fp32 (bb,S,S) per-head temporaries (probs / dropped probs / dpd /
    dp / ds in the backward).  Sized for the BACKWARD (qkv + g in, dqkv
    out) so forward and backward always pick the SAME block — the on-core
    dropout PRNG is seeded per batch-block program, so a fwd/bwd block
    mismatch would desynchronize the masks.

    Returns 0 when even a single-item block does not fit (caller falls
    back to the unfused XLA path).
    """
    budget = 12 * 1024 * 1024
    hidden = three_h // 3
    io_blocks = (2 * seq * three_h + seq * hidden) * itemsize + seq * 4
    if bias_full_heads:
        # Full per-head bias: (bb, NH, S, S) fp32 input + the same-shaped
        # dbias output in the backward.
        io_blocks += 2 * bias_full_heads * seq * seq * 4
    per_item = 2 * io_blocks + 5 * seq * seq * 4
    bb = 16
    while bb > 1 and (batch % bb != 0 or bb * per_item > budget):
        bb //= 2
    return 0 if per_item > budget else bb


def _head_slices(qkv_ref, h: int, hd: int, hidden: int):
    """Static per-head q/k/v (bb, S, HD) slices of the packed QKV block."""
    q = qkv_ref[:, :, h * hd:(h + 1) * hd]
    k = qkv_ref[:, :, hidden + h * hd:hidden + (h + 1) * hd]
    v = qkv_ref[:, :, 2 * hidden + h * hd:2 * hidden + (h + 1) * hd]
    return q, k, v


def _scores(q, k, bias, inv_sqrt_hd):
    """``bias`` arrives pre-shaped for this head: (bb, 1, S) for a key
    bias, (bb, S, S) for a full per-head bias."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    return s * inv_sqrt_hd + bias


def _dropout_bits(shape, threshold):
    bits = pltpu.prng_random_bits(shape)
    return pltpu.bitcast(bits, jnp.uint32) >= jnp.uint32(threshold)


def _attention_fwd_kernel(seed_ref, qkv_ref, bias_ref, *rest, num_heads: int,
                          head_dim: int, rate: float, threshold: int,
                          external_mask: bool, full_bias: bool):
    keep_ref, out_ref = rest if external_mask else (None, *rest)
    hidden = num_heads * head_dim
    inv_sqrt_hd = 1.0 / math.sqrt(head_dim)
    if rate > 0.0:
        if not external_mask:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        inv_keep = jnp.float32(1.0 / (1.0 - rate))
    bias = None if full_bias else bias_ref[:][:, None, :]
    for h in range(num_heads):
        if full_bias:
            bias = bias_ref[:, h]
        q, k, v = _head_slices(qkv_ref, h, head_dim, hidden)
        probs = jax.nn.softmax(_scores(q, k, bias, inv_sqrt_hd), axis=-1)
        if rate > 0.0:
            keep = (keep_ref[:, h] != 0 if external_mask
                    else _dropout_bits(probs.shape, threshold))
            probs = jnp.where(keep, probs * inv_keep, 0.0)
        ctx = jax.lax.dot_general(
            probs.astype(qkv_ref.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:, :, h * head_dim:(h + 1) * head_dim] = (
            ctx.astype(out_ref.dtype))


def _attention_bwd_kernel(seed_ref, qkv_ref, bias_ref, g_ref, *rest,
                          num_heads: int, head_dim: int, rate: float,
                          threshold: int, external_mask: bool,
                          full_bias: bool):
    if external_mask:
        keep_ref, dqkv_ref, *dbias_out = rest
    else:
        keep_ref = None
        dqkv_ref, *dbias_out = rest
    dbias_ref = dbias_out[0] if full_bias else None
    hidden = num_heads * head_dim
    inv_sqrt_hd = 1.0 / math.sqrt(head_dim)
    if rate > 0.0:
        # Same seed + same draw order as forward => identical masks.
        if not external_mask:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        inv_keep = jnp.float32(1.0 / (1.0 - rate))
    bias = None if full_bias else bias_ref[:][:, None, :]
    cdt = qkv_ref.dtype
    for h in range(num_heads):
        if full_bias:
            bias = bias_ref[:, h]
        q, k, v = _head_slices(qkv_ref, h, head_dim, hidden)
        g = g_ref[:, :, h * head_dim:(h + 1) * head_dim]
        probs = jax.nn.softmax(_scores(q, k, bias, inv_sqrt_hd), axis=-1)
        if rate > 0.0:
            keep = (keep_ref[:, h] != 0 if external_mask
                    else _dropout_bits(probs.shape, threshold))
            probs_d = jnp.where(keep, probs * inv_keep, 0.0)
        else:
            probs_d = probs
        pd16 = probs_d.astype(cdt)
        # dv = probs_d^T @ g   (contract the query dim)
        dv = jax.lax.dot_general(
            pd16, g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # d(probs_d) = g @ v^T (contract head_dim)
        dpd = jax.lax.dot_general(
            g, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if rate > 0.0:
            dp = jnp.where(keep, dpd * inv_keep, 0.0)
        else:
            dp = dpd
        # softmax backward (fp32): ds = p * (dp - sum(dp * p))
        ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
        if full_bias:
            # The bias is added directly to the scaled scores, so its
            # gradient is the raw score gradient (before the 1/sqrt(hd)
            # that belongs to the q.k product only).
            dbias_ref[:, h] = ds
        ds = (ds * inv_sqrt_hd).astype(cdt)
        # dq = ds @ k ; dk = ds^T @ q
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dqkv_ref[:, :, h * head_dim:(h + 1) * head_dim] = dq.astype(cdt)
        dqkv_ref[:, :, hidden + h * head_dim:
                 hidden + (h + 1) * head_dim] = dk.astype(cdt)
        dqkv_ref[:, :, 2 * hidden + h * head_dim:
                 2 * hidden + (h + 1) * head_dim] = dv.astype(cdt)


def _grid_call(kernel, seed, inputs, out_shape, bb, interpret):
    """pallas_call over batch blocks with the seed scalar-prefetched.

    ``out_shape`` may be a single ShapeDtypeStruct or a tuple of them
    (all blocked on the leading batch dim)."""
    batch = inputs[0].shape[0]
    def _imap(ndim):
        # With scalar prefetch the index_map receives (i, *scalar_refs).
        return lambda i, *_: (i,) + (0,) * (ndim - 1)

    specs = [
        pl.BlockSpec((bb,) + arr.shape[1:], _imap(arr.ndim),
                     memory_space=pltpu.VMEM)
        for arr in inputs
    ]
    multi = isinstance(out_shape, (tuple, list))
    outs = tuple(out_shape) if multi else (out_shape,)
    out_specs = tuple(
        pl.BlockSpec((bb,) + o.shape[1:], _imap(len(o.shape)),
                     memory_space=pltpu.VMEM)
        for o in outs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch // bb,),
        in_specs=specs,
        out_specs=out_specs if multi else out_specs[0],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=tuple(outs) if multi else outs[0],
        interpret=interpret)(seed, *inputs)


def _xla_attention(qkv, bias, num_heads: int, dropout_rate: float,
                   dropout_rng: Optional[jax.Array]):
    """Reference/fallback path — the exact computation models/bert.py uses,
    on the packed-QKV layout (reference: CLIP-Lite trains HF BertModel,
    encoder.py:160-176; math per Vaswani et al.).  ``bias`` is (B, S) key
    bias or (B, NH, S, S) full per-head bias."""
    b, s, three_h = qkv.shape
    hidden = three_h // 3
    hd = hidden // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, num_heads, hd)
    k = k.reshape(b, s, num_heads, hd)
    v = v.reshape(b, s, num_heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    add = bias if bias.ndim == 4 else bias[:, None, None, :]
    scores = scores / math.sqrt(hd) + add
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(qkv.dtype), v,
                     preferred_element_type=qkv.dtype)
    return ctx.reshape(b, s, hidden)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused(qkv, bias, seed, num_heads, head_dim, rate, interpret):
    out, _ = _fused_fwd(qkv, bias, seed, num_heads, head_dim, rate,
                        interpret)
    return out


def _external_keep_mask(seed, b, num_heads, s, rate):
    """Interpret-mode (CPU test) substitute for the on-core PRNG: the same
    keep mask derived from the same seed in fwd and bwd."""
    key = jax.random.PRNGKey(seed[0].astype(jnp.uint32))
    return (jax.random.uniform(key, (b, num_heads, s, s)) >= rate).astype(
        jnp.int8)


def _fused_fwd(qkv, bias, seed, num_heads, head_dim, rate, interpret):
    b, s, three_h = qkv.shape
    full = bias.ndim == 4
    bb = _pick_batch_block(b, s, three_h, qkv.dtype.itemsize,
                           num_heads if full else 0)
    threshold = min(int(rate * 2.0 ** 32), 2 ** 32 - 1)
    external = bool(interpret) and rate > 0.0
    kernel = functools.partial(
        _attention_fwd_kernel, num_heads=num_heads, head_dim=head_dim,
        rate=rate, threshold=threshold, external_mask=external,
        full_bias=full)
    inputs = (qkv, bias)
    if external:
        inputs += (_external_keep_mask(seed, b, num_heads, s, rate),)
    out = _grid_call(
        kernel, seed, inputs,
        jax.ShapeDtypeStruct((b, s, num_heads * head_dim), qkv.dtype),
        bb, interpret)
    return out, (qkv, bias, seed)


def _fused_bwd(num_heads, head_dim, rate, interpret, res, g):
    qkv, bias, seed = res
    b, s, three_h = qkv.shape
    full = bias.ndim == 4
    bb = _pick_batch_block(b, s, three_h, qkv.dtype.itemsize,
                           num_heads if full else 0)
    threshold = min(int(rate * 2.0 ** 32), 2 ** 32 - 1)
    external = bool(interpret) and rate > 0.0
    kernel = functools.partial(
        _attention_bwd_kernel, num_heads=num_heads, head_dim=head_dim,
        rate=rate, threshold=threshold, external_mask=external,
        full_bias=full)
    inputs = (qkv, bias, g.astype(qkv.dtype))
    if external:
        inputs += (_external_keep_mask(seed, b, num_heads, s, rate),)
    out_shape = jax.ShapeDtypeStruct(qkv.shape, qkv.dtype)
    if full:
        # A full per-head bias (e.g. MPNet's learned relative position
        # table) receives a real gradient: dbias = dscores.
        dqkv, dbias = _grid_call(
            kernel, seed, inputs,
            (out_shape, jax.ShapeDtypeStruct(bias.shape, jnp.float32)),
            bb, interpret)
        dbias = dbias.astype(bias.dtype)
    else:
        dqkv = _grid_call(kernel, seed, inputs, out_shape, bb, interpret)
        dbias = jnp.zeros_like(bias)  # key mask bias is a constant input
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dqkv, dbias, dseed


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_short_attention(qkv: jax.Array, mask_bias: jax.Array,
                          num_heads: int, *,
                          dropout_rate: float = 0.0,
                          dropout_rng: Optional[jax.Array] = None,
                          deterministic: bool = True,
                          interpret: Optional[bool] = None) -> jax.Array:
    """Multi-head self-attention over packed QKV, fused on TPU.

    Args:
      qkv: (B, S, 3*H) fused projection output (q | k | v thirds, each
        head-major).
      mask_bias: additive fp32 score bias — either (B, S) on key
        positions (0 on real tokens, ``MASK_VALUE`` on padding), or a
        full (B, NH, S, S) per-head bias (e.g. MPNet's learned relative
        position bias + padding mask; gradients flow to a full bias).
      num_heads: number of attention heads; H must divide by it.
      dropout_rate: attention-probability dropout rate.
      dropout_rng: PRNG key, required when dropout is active.
      deterministic: disables dropout (eval mode).
      interpret: force Pallas interpreter mode (CPU testing); default
        auto — compiled on TPU backends, interpreted elsewhere.

    Returns:
      (B, S, H) context, same dtype as ``qkv``.
    """
    b, s, three_h = qkv.shape
    hidden = three_h // 3
    head_dim = hidden // num_heads
    rate = 0.0 if deterministic else float(dropout_rate)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Fall back to plain XLA where the fused kernel doesn't apply: odd
    # batch blocks, sequences too long for an (S,S) VMEM tile per head,
    # or a working set that exceeds VMEM even at block size 1.
    full_heads = num_heads if mask_bias.ndim == 4 else 0
    if (b % 2 != 0 or s > 256 or hidden != num_heads * head_dim
            or _pick_batch_block(b, s, three_h, qkv.dtype.itemsize,
                                 full_heads) == 0):
        return _xla_attention(qkv, mask_bias, num_heads, rate, dropout_rng)
    if rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rng required when dropout is active")
        seed = jax.random.randint(dropout_rng, (1,), -2 ** 31, 2 ** 31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    return _fused(qkv, mask_bias, seed, num_heads, head_dim, rate,
                  bool(interpret))


def resolve_fused_flag(flag) -> bool:
    """Resolve the tri-state MODEL.TEXTUAL.FUSED_ATTENTION value:
    "auto" enables the kernel on TPU backends; "true"/"false" (or a real
    bool) force it on/off."""
    if isinstance(flag, str):
        low = flag.lower()
        if low == "auto":
            return jax.default_backend() == "tpu"
        return low in ("true", "1", "yes")
    return bool(flag)


__all__ = ["fused_short_attention", "resolve_fused_flag", "MASK_VALUE"]
