"""MPNet text tower in Flax, HF-compatible.

The reference's alternative text transformer
(reference: encoder.py:171-175, ``AutoModel.from_config(MPNetConfig())``),
used with masked mean pooling (encoder.py:192-198).  Architecture facts
mirrored from the MPNet paper/HF config: RoBERTa-style position ids that
skip padding (pad token 1), T5-style shared relative attention bias
(32 buckets, max distance 128) added to every layer's attention scores,
LayerNorm eps 1e-5, GELU intermediate.

TPU notes: fused QKV GEMM, fp32 softmax/LN, static shapes; the relative
position bias is computed once per forward and broadcast to all layers.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

dense_init = nn.initializers.normal(stddev=0.02)


def relative_position_bucket(relative_position: jax.Array,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> jax.Array:
    """T5-style signed log-bucketed relative positions."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    num_buckets = num_buckets // 2
    ret = ret + (n < 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class MPNetLayer(nn.Module):
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    dropout_rate: float = 0.1
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32
    fused_attention: bool = False

    @nn.compact
    def __call__(self, x, bias, deterministic=True):
        """x: (B*S, H) token-flattened (see models/bert.py — XLA emits
        (B,S,H) dots as batched convolutions at a fraction of the GEMM
        throughput); ``bias`` is (B, nh, S, S) rel-pos + padding."""
        h, nh = self.hidden_size, self.num_heads
        hd = h // nh
        s = bias.shape[-1]
        b = x.shape[0] // s
        xin = x.astype(self.dtype)

        qkv = nn.Dense(3 * h, kernel_init=dense_init, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(xin)
        if self.fused_attention:
            # One Pallas kernel per direction over the packed QKV; the
            # full (B,NH,S,S) bias operand carries MPNet's learned
            # relative position table (its gradient comes back as dbias).
            from clip_lite_tpu.ops.attention import fused_short_attention

            rate = self.dropout_rate
            rng = (self.make_rng("dropout")
                   if not deterministic and rate > 0.0 else None)
            ctx = fused_short_attention(
                qkv.reshape(b, s, 3 * h), bias, nh, dropout_rate=rate,
                dropout_rng=rng,
                deterministic=deterministic).reshape(b * s, h)
        else:
            q, k, v = jnp.split(qkv.reshape(b, s, 3 * h), 3, axis=-1)
            q = q.reshape(b, s, nh, hd)
            k = k.reshape(b, s, nh, hd)
            v = v.reshape(b, s, nh, hd)

            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / math.sqrt(hd) + bias  # rel-pos + padding
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            probs = nn.Dropout(self.dropout_rate,
                               deterministic=deterministic)(probs)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(self.dtype), v,
                             preferred_element_type=self.dtype
                             ).reshape(b * s, h)

        attn_out = nn.Dense(h, kernel_init=dense_init, dtype=self.dtype,
                            param_dtype=jnp.float32, name="attn_out")(ctx)
        attn_out = nn.Dropout(self.dropout_rate,
                              deterministic=deterministic)(attn_out)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="attn_ln")(
            (x + attn_out).astype(jnp.float32)).astype(self.dtype)

        inter = nn.Dense(self.intermediate_size, kernel_init=dense_init,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="intermediate")(x)
        inter = nn.gelu(inter.astype(jnp.float32),
                        approximate=False).astype(self.dtype)
        out = nn.Dense(h, kernel_init=dense_init, dtype=self.dtype,
                       param_dtype=jnp.float32, name="output")(inter)
        out = nn.Dropout(self.dropout_rate, deterministic=deterministic)(out)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="out_ln")(
            (x + out).astype(jnp.float32)).astype(self.dtype)
        return x


class MPNetModel(nn.Module):
    """Returns (sequence_output fp32, pooled_output fp32)."""

    vocab_size: int = 30527
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 514
    pad_token_id: int = 1
    relative_attention_num_buckets: int = 32
    dropout_rate: float = 0.1
    layer_norm_eps: float = 1e-5
    dtype_name: str = "float32"
    fused_attention: str = "auto"  # "auto" = Pallas kernel on TPU backends

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, deterministic=True):
        from clip_lite_tpu.ops.attention import resolve_fused_flag

        dtype = jnp.bfloat16 if self.dtype_name == "bfloat16" else jnp.float32
        fused = resolve_fused_flag(self.fused_attention)
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)

        # RoBERTa-style positions: pad stays at pad_token_id, real tokens
        # count up from pad_token_id + 1.
        not_pad = (input_ids != self.pad_token_id).astype(jnp.int32)
        position_ids = jnp.cumsum(not_pad, axis=1) * not_pad + self.pad_token_id

        word = nn.Embed(self.vocab_size, self.hidden_size,
                        embedding_init=dense_init, param_dtype=jnp.float32,
                        name="word")(input_ids)
        pos = nn.Embed(self.max_position, self.hidden_size,
                       embedding_init=dense_init, param_dtype=jnp.float32,
                       name="position")(position_ids)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="emb_ln")(
            (word + pos).astype(jnp.float32))
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = x.astype(dtype)

        # Shared relative attention bias (T5 buckets), one table for all
        # layers; plus the additive padding mask.
        positions = jnp.arange(s)
        rel = positions[None, :] - positions[:, None]  # memory - query
        buckets = relative_position_bucket(
            rel, self.relative_attention_num_buckets)
        rel_bias_table = nn.Embed(
            self.relative_attention_num_buckets, self.num_heads,
            embedding_init=dense_init, param_dtype=jnp.float32,
            name="relative_attention_bias")(buckets)  # (s, s, nh)
        rel_bias = rel_bias_table.transpose(2, 0, 1)[None]  # (1, nh, s, s)
        pad_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32))
        pad_bias = pad_bias * jnp.finfo(jnp.float32).min * 0.5
        bias = jnp.broadcast_to(rel_bias + pad_bias,
                                (b, self.num_heads, s, s))

        # Token-flattened (B*S, H) through the stack (see MPNetLayer).
        x = x.reshape(b * s, self.hidden_size)
        for i in range(self.num_hidden_layers):
            x = MPNetLayer(
                hidden_size=self.hidden_size, num_heads=self.num_heads,
                intermediate_size=self.intermediate_size,
                dropout_rate=self.dropout_rate,
                layer_norm_eps=self.layer_norm_eps, dtype=dtype,
                fused_attention=fused,
                name=f"layer_{i}")(x, bias, deterministic)

        sequence_output = x.reshape(b, s, self.hidden_size).astype(
            jnp.float32)
        cls = sequence_output[:, 0]
        pooled = nn.Dense(self.hidden_size, kernel_init=dense_init,
                          dtype=jnp.float32, param_dtype=jnp.float32,
                          name="pooler")(cls)
        pooled = jnp.tanh(pooled)
        return sequence_output, pooled


def import_hf_mpnet_state_dict(state_dict, num_layers: int) -> dict:
    """Convert a HF ``MPNetModel`` state_dict into this module's params."""
    sd = {k.replace("mpnet.", ""): np.asarray(v) for k, v in state_dict.items()}

    def lin(prefix):
        return sd[prefix + ".weight"].T, sd[prefix + ".bias"]

    params: dict = {
        "word": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "emb_ln": {"scale": sd["embeddings.LayerNorm.weight"],
                   "bias": sd["embeddings.LayerNorm.bias"]},
        "relative_attention_bias": {
            "embedding": sd["encoder.relative_attention_bias.weight"]},
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        qk, qb = lin(f"{p}.attention.attn.q")
        kk, kb = lin(f"{p}.attention.attn.k")
        vk, vb = lin(f"{p}.attention.attn.v")
        ok_, ob_ = lin(f"{p}.attention.attn.o")
        ik, ib = lin(f"{p}.intermediate.dense")
        outk, outb = lin(f"{p}.output.dense")
        params[f"layer_{i}"] = {
            "qkv": {"kernel": np.concatenate([qk, kk, vk], axis=1),
                    "bias": np.concatenate([qb, kb, vb])},
            "attn_out": {"kernel": ok_, "bias": ob_},
            "attn_ln": {"scale": sd[f"{p}.attention.LayerNorm.weight"],
                        "bias": sd[f"{p}.attention.LayerNorm.bias"]},
            "intermediate": {"kernel": ik, "bias": ib},
            "output": {"kernel": outk, "bias": outb},
            "out_ln": {"scale": sd[f"{p}.output.LayerNorm.weight"],
                       "bias": sd[f"{p}.output.LayerNorm.bias"]},
        }
    if "pooler.dense.weight" in sd:
        pk, pb = lin("pooler.dense")
        params["pooler"] = {"kernel": pk, "bias": pb}
    return jax.tree.map(jnp.asarray, {"params": params})
