"""BERT text tower in Flax, HF-compatible, built for the MXU.

The reference trains ``transformers.BertModel`` from scratch with a
``num_hidden_layers`` knob or loads pretrained weights
(reference: encoder.py:160-176).  This is a from-scratch Flax encoder with
the same architecture contract (so HF torch checkpoints import losslessly)
and TPU-minded kernel shapes:

  * fused QKV projection — one (H, 3H) matmul instead of three (H, H),
    keeping the MXU busy with one large GEMM;
  * static sequence length (captions padded to MAX_CAPTION_LENGTH=30);
  * additive attention mask of -1e9 on padding, computed in fp32;
  * bfloat16 matmuls under AMP, LayerNorm/softmax in fp32.

Weight import from HF torch state_dicts is provided for parity testing and
pretrained initialization (``import_hf_bert_state_dict``).
"""

from __future__ import annotations

import math
from dataclasses import field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

bert_dense_init = nn.initializers.normal(stddev=0.02)


class BertEmbeddings(nn.Module):
    vocab_size: int = 30522
    hidden_size: int = 768
    max_position: int = 512
    type_vocab_size: int = 2
    dropout_rate: float = 0.1
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic=True):
        b, s = input_ids.shape
        word = nn.Embed(self.vocab_size, self.hidden_size,
                        embedding_init=bert_dense_init,
                        param_dtype=jnp.float32, name="word")(input_ids)
        pos_ids = jnp.arange(s)[None, :]
        pos = nn.Embed(self.max_position, self.hidden_size,
                       embedding_init=bert_dense_init,
                       param_dtype=jnp.float32, name="position")(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        typ = nn.Embed(self.type_vocab_size, self.hidden_size,
                       embedding_init=bert_dense_init,
                       param_dtype=jnp.float32, name="token_type")(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="ln")(x.astype(jnp.float32))
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return x.astype(self.dtype)


class BertLayer(nn.Module):
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    dropout_rate: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32
    fused_attention: bool = False

    @nn.compact
    def __call__(self, x, mask_bias, deterministic=True):
        """x: (B*S, H) — the tower runs token-flattened so every Dense/LN
        is a clean 2-D GEMM/rowwise op (XLA emits (B,S,H) dots as batched
        convolutions with the MXU M-dim split per batch row: measured
        ~75 vs ~180 TF/s on the FFN, ~5 ms/step on TPU v5e at bs128).
        ``mask_bias`` is (B, S); B recovers from it."""
        h = self.hidden_size
        nh = self.num_heads
        hd = h // nh
        b, s = mask_bias.shape
        xin = x.astype(self.dtype)

        # Fused QKV: one (H, 3H) GEMM.
        qkv = nn.Dense(3 * h, kernel_init=bert_dense_init, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(xin)
        if self.fused_attention:
            # One Pallas kernel per direction: scores+mask+softmax+dropout+
            # context, flash-style recompute backward, on-core PRNG
            # (ops/attention.py — the ~9 ms/step XLA kernel-count tax).
            from clip_lite_tpu.ops.attention import fused_short_attention

            rate = self.attention_dropout
            rng = (self.make_rng("dropout")
                   if not deterministic and rate > 0.0 else None)
            ctx = fused_short_attention(
                qkv.reshape(b, s, 3 * h), mask_bias, nh, dropout_rate=rate,
                dropout_rng=rng,
                deterministic=deterministic).reshape(b * s, h)
        else:
            q, k, v = jnp.split(qkv.reshape(b, s, 3 * h), 3, axis=-1)
            q = q.reshape(b, s, nh, hd)
            k = k.reshape(b, s, nh, hd)
            v = v.reshape(b, s, nh, hd)

            # Scores in fp32 for stable softmax.
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / math.sqrt(hd) + mask_bias[:, None, None, :]
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            probs = nn.Dropout(self.attention_dropout,
                               deterministic=deterministic)(probs)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(self.dtype), v,
                             preferred_element_type=self.dtype)
            ctx = ctx.reshape(b * s, h)

        attn_out = nn.Dense(h, kernel_init=bert_dense_init, dtype=self.dtype,
                            param_dtype=jnp.float32, name="attn_out")(ctx)
        attn_out = nn.Dropout(self.dropout_rate,
                              deterministic=deterministic)(attn_out)
        # LayerNorm/gelu stay in the compute dtype: flax computes LN
        # statistics in fp32 internally, so there is no precision loss in
        # the reductions — only the (bandwidth-dominated) elementwise tail
        # runs in bf16, avoiding a fp32 round-trip per residual join.
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                         param_dtype=jnp.float32, name="attn_ln")(
            xin + attn_out)

        inter = nn.Dense(self.intermediate_size, kernel_init=bert_dense_init,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="intermediate")(x)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(h, kernel_init=bert_dense_init, dtype=self.dtype,
                       param_dtype=jnp.float32, name="output")(inter)
        out = nn.Dropout(self.dropout_rate, deterministic=deterministic)(out)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                         param_dtype=jnp.float32, name="out_ln")(x + out)
        return x


class BertModel(nn.Module):
    """Returns (sequence_output fp32, pooled_output fp32)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    dropout_rate: float = 0.1
    layer_norm_eps: float = 1e-12
    dtype_name: str = "float32"
    add_pooler: bool = True
    fused_attention: str = "auto"  # "auto" = Pallas kernel on TPU backends

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic: bool = True):
        dtype = jnp.bfloat16 if self.dtype_name == "bfloat16" else jnp.float32
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        # Additive bias: 0 on real tokens, large negative on padding.
        mask_bias = (1.0 - attention_mask.astype(jnp.float32)) * (
            jnp.finfo(jnp.float32).min * 0.5)
        from clip_lite_tpu.ops.attention import resolve_fused_flag

        fused = resolve_fused_flag(self.fused_attention)
        b, s = input_ids.shape

        x = BertEmbeddings(
            vocab_size=self.vocab_size, hidden_size=self.hidden_size,
            max_position=self.max_position,
            type_vocab_size=self.type_vocab_size,
            dropout_rate=self.dropout_rate,
            layer_norm_eps=self.layer_norm_eps, dtype=dtype,
            name="embeddings")(input_ids, token_type_ids, deterministic)

        # Token-flattened (B*S, H) through the encoder stack (see BertLayer).
        x = x.reshape(b * s, self.hidden_size)
        for i in range(self.num_hidden_layers):
            x = BertLayer(
                hidden_size=self.hidden_size, num_heads=self.num_heads,
                intermediate_size=self.intermediate_size,
                dropout_rate=self.dropout_rate,
                attention_dropout=self.dropout_rate,
                layer_norm_eps=self.layer_norm_eps, dtype=dtype,
                fused_attention=fused,
                name=f"layer_{i}")(x, mask_bias, deterministic)

        sequence_output = x.reshape(b, s, self.hidden_size).astype(
            jnp.float32)
        pooled = None
        if self.add_pooler:
            cls = sequence_output[:, 0]
            pooled = nn.Dense(self.hidden_size, kernel_init=bert_dense_init,
                              dtype=jnp.float32, param_dtype=jnp.float32,
                              name="pooler")(cls)
            pooled = jnp.tanh(pooled)
        return sequence_output, pooled


def masked_mean_pooling(token_embeddings: jax.Array,
                        attention_mask: jax.Array) -> jax.Array:
    """SBERT-style mean pooling over non-padding tokens
    (reference: encoder.py:215-225)."""
    mask = attention_mask[..., None].astype(jnp.float32)
    summed = jnp.sum(token_embeddings.astype(jnp.float32) * mask, axis=1)
    denom = jnp.clip(mask.sum(axis=1), min=1e-9)
    return summed / denom


# ---------------------------------------------------------------------------
# HF torch -> Flax weight import (parity + pretrained init).
# ---------------------------------------------------------------------------

def import_hf_bert_state_dict(state_dict, num_layers: int) -> dict:
    """Convert a HF ``BertModel`` state_dict into this module's params.

    QKV kernels are concatenated into the fused projection. Keys follow HF
    naming (``encoder.layer.N.attention.self.query.weight`` etc.).
    """
    sd = {k.replace("bert.", ""): np.asarray(v) for k, v in state_dict.items()}

    def lin(prefix):  # torch Linear -> (kernel.T, bias)
        return sd[prefix + ".weight"].T, sd[prefix + ".bias"]

    params: dict = {
        "embeddings": {
            "word": {"embedding": sd["embeddings.word_embeddings.weight"]},
            "position": {"embedding": sd["embeddings.position_embeddings.weight"]},
            "token_type": {"embedding": sd["embeddings.token_type_embeddings.weight"]},
            "ln": {"scale": sd["embeddings.LayerNorm.weight"],
                   "bias": sd["embeddings.LayerNorm.bias"]},
        }
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        qk, qb = lin(f"{p}.attention.self.query")
        kk, kb = lin(f"{p}.attention.self.key")
        vk, vb = lin(f"{p}.attention.self.value")
        ak, ab = lin(f"{p}.attention.output.dense")
        ik, ib = lin(f"{p}.intermediate.dense")
        ok, ob = lin(f"{p}.output.dense")
        params[f"layer_{i}"] = {
            "qkv": {"kernel": np.concatenate([qk, kk, vk], axis=1),
                    "bias": np.concatenate([qb, kb, vb])},
            "attn_out": {"kernel": ak, "bias": ab},
            "attn_ln": {"scale": sd[f"{p}.attention.output.LayerNorm.weight"],
                        "bias": sd[f"{p}.attention.output.LayerNorm.bias"]},
            "intermediate": {"kernel": ik, "bias": ib},
            "output": {"kernel": ok, "bias": ob},
            "out_ln": {"scale": sd[f"{p}.output.LayerNorm.weight"],
                       "bias": sd[f"{p}.output.LayerNorm.bias"]},
        }
    if "pooler.dense.weight" in sd:
        pk, pb = lin("pooler.dense")
        params["pooler"] = {"kernel": pk, "bias": pb}
    return jax.tree.map(jnp.asarray, {"params": params})
