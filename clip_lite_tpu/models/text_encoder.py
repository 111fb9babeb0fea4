"""Text tower wrapper: glove / sbert / train_sbert / finetune_sbert modes.

Equivalent of the reference's TextEncoder (reference: encoder.py:115-279):
  * ``glove``      — embedding lookup + mean pool over tokens;
  * ``sbert``      — precomputed 768-d sentence vectors pass through;
  * ``train_sbert``— BERT trained from scratch with a depth knob, or MPNet;
  * ``finetune_sbert`` — pretrained transformer (weights imported from a
    local HF torch checkpoint — this environment has no network).

``transform_embedding`` adds the optional 2-layer MLP head
(reference: encoder.py:182-185,200-203).  For BERT the sentence embedding
is the pooler output; for MPNet (and other non-BERT names) it is masked
mean pooling (reference: encoder.py:192-198).
"""

from __future__ import annotations

import json
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from clip_lite_tpu.models.bert import BertModel, masked_mean_pooling
from clip_lite_tpu.ops.layers import Linear


class TextEncoder(nn.Module):
    mode: str = "train_sbert"
    transform_embedding: bool = False
    txt_enc_dim: int = 512
    model_name: str = "bert-base-uncased"
    pretrained: bool = False
    num_hidden_layers: int = 12
    vocab_size: int = 30522
    glove_dim: int = 300
    glove_vocab_size: int = 400002
    word_dict_path: str = ""
    glove_path: str = ""
    load_glove: bool = False
    train_embeddings: bool = False
    dtype_name: str = "float32"
    # "auto" = Pallas fused attention on TPU backends; "true"/"false"
    # force it on/off (MODEL.TEXTUAL.FUSED_ATTENTION).
    fused_attention: str = "auto"
    # Transformer hidden/attention dropout (MODEL.TEXTUAL.DROPOUT).
    transformer_dropout: float = 0.1
    # BERT tower hidden width (MODEL.TEXTUAL.HIDDEN_SIZE).  768 is the
    # bert-base flagship; smaller widths give architecture-faithful tiny
    # towers (heads = hidden//64, FFN = 4*hidden scale with it).  MPNet
    # and precomputed-sbert modes are fixed at 768.
    hidden_size: int = 768

    def setup(self):
        if self.mode == "glove":
            self.txt_enc_layer = nn.Embed(
                self.glove_vocab_size, self.glove_dim,
                param_dtype=jnp.float32, name="embedding")
            in_dim = self.glove_dim
        elif self.mode == "sbert":
            in_dim = 768
        elif self.mode in ("train_sbert", "finetune_sbert"):
            if "mpnet" in self.model_name:
                from clip_lite_tpu.models.mpnet import MPNetModel

                self.transformer = MPNetModel(
                    num_hidden_layers=self.num_hidden_layers,
                    dtype_name=self.dtype_name,
                    fused_attention=self.fused_attention,
                    dropout_rate=self.transformer_dropout,
                    name="transformer")
            else:
                h = self.hidden_size
                self.transformer = BertModel(
                    vocab_size=self.vocab_size,
                    hidden_size=h,
                    num_heads=max(1, h // 64),
                    intermediate_size=4 * h,
                    num_hidden_layers=self.num_hidden_layers,
                    dtype_name=self.dtype_name,
                    fused_attention=self.fused_attention,
                    dropout_rate=self.transformer_dropout,
                    name="transformer")
            in_dim = 768 if "mpnet" in self.model_name else self.hidden_size
        else:
            raise ValueError(f"Unknown text encoder mode {self.mode!r}")

        if self.transform_embedding:
            self.fc1 = Linear(self.txt_enc_dim, name="fc1")
            self.fc2 = Linear(self.txt_enc_dim, name="fc2")
        del in_dim

    @property
    def feature_size(self) -> int:
        if self.transform_embedding:
            return self.txt_enc_dim
        if self.mode == "glove":
            return self.glove_dim
        if self.mode in ("train_sbert", "finetune_sbert") \
                and "mpnet" not in self.model_name:
            return self.hidden_size
        return 768

    def __call__(self, batch: dict, train: bool = True) -> jax.Array:
        """batch keys by mode:
          glove:        caption_tokens (B, L) int
          sbert:        caption_encodings (B, 768) float
          train_sbert:  input_ids, attention_mask (B, L) int
        """
        if self.mode == "glove":
            x = self.txt_enc_layer(batch["caption_tokens"])
            if not self.train_embeddings:
                x = jax.lax.stop_gradient(x)
            x = jnp.mean(x.astype(jnp.float32), axis=1)
        elif self.mode == "sbert":
            x = batch["caption_encodings"].astype(jnp.float32)
        else:
            seq, pooled = self.transformer(
                batch["input_ids"],
                attention_mask=batch.get("attention_mask"),
                deterministic=not train)
            if "bert" in self.model_name and "mpnet" not in self.model_name:
                x = pooled
            else:
                x = masked_mean_pooling(seq, batch["attention_mask"])

        if self.transform_embedding:
            x = self.fc1(x)
            x = nn.relu(x)
            x = self.fc2(x)
        return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# GloVe utilities (reference: encoder.py:227-279, host-side, offline).
# ---------------------------------------------------------------------------

def load_glove_matrix(glove_path: str, word_dict: dict,
                      seed: int = 0) -> np.ndarray:
    """Build the (vocab, dim) embedding matrix: GloVe vector when the word
    is known, N(0, 0.6) otherwise (reference: encoder.py:227-249)."""
    glove = {}
    dim = None
    with open(glove_path, "r") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            glove[parts[0]] = np.asarray(parts[1:], dtype=np.float32)
            dim = len(parts) - 1
    rng = np.random.RandomState(seed)
    matrix = np.zeros((len(word_dict), dim), dtype=np.float32)
    for word, idx in word_dict.items():
        vec = glove.get(word)
        matrix[idx] = vec if vec is not None else rng.normal(
            scale=0.6, size=(dim,))
    return matrix


def glove_text_encoder_params(variables: dict, matrix: np.ndarray) -> dict:
    """Overwrite the glove-mode embedding table with a loaded matrix."""
    params = jax.tree.map(lambda x: x, variables)  # shallow copy
    params["params"]["embedding"]["embedding"] = jnp.asarray(matrix)
    return params


def load_word_dict(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
