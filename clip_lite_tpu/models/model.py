"""VLInfoModel: glue composing image tower + text tower + JSD loss.

Equivalent of the reference's model glue (reference: model.py:15-113):
dispatches text encoding on mode, optionally encodes hard-negative and
augmented pairs when the batch carries them (dict structure is static at
trace time, so the reference's ``if "neg_input_ids" in batch`` checks
compile away cleanly), and returns the loss dict.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from clip_lite_tpu.models.image_encoder import ImageEncoder
from clip_lite_tpu.models.text_encoder import TextEncoder
from clip_lite_tpu.ops.loss import JSDInfoMaxLoss


class VLInfoModel(nn.Module):
    image_encoder: ImageEncoder
    text_encoder: TextEncoder
    loss: JSDInfoMaxLoss
    mode: str = "train_sbert"

    def __call__(self, batch: Dict[str, jax.Array],
                 train: bool = True) -> Dict[str, Any]:
        image_features = self.image_encoder(batch["image"], train=train)
        text_features = self.text_encoder(batch, train=train)

        neg_image_features = None
        neg_text_features = None
        aug_image_features = None
        aug_text_features = None

        if self.mode == "train_sbert":
            if "neg_input_ids" in batch:
                neg_image_features = self.image_encoder(
                    batch["neg_image"], train=train)
                neg_text_features = self.text_encoder(
                    {"input_ids": batch["neg_input_ids"],
                     "attention_mask": batch["neg_attention_mask"]},
                    train=train)
            if "aug_image" in batch:
                aug_image_features = self.image_encoder(
                    batch["aug_image"], train=train)
            if "aug_input_ids" in batch:
                aug_text_features = self.text_encoder(
                    {"input_ids": batch["aug_input_ids"],
                     "attention_mask": batch["aug_attention_mask"]},
                    train=train)

        loss_dict = self.loss(
            image_features=image_features,
            text_features=text_features,
            neg_image_features=neg_image_features,
            neg_text_features=neg_text_features,
            aug_image_features=aug_image_features,
            aug_text_features=aug_text_features,
            train=train,
        )
        return {
            "loss": loss_dict["total_loss"],
            "loss_components": {
                k: jax.lax.stop_gradient(v) for k, v in loss_dict.items()
            },
        }

    # -- encoding APIs reused by downstream evals -------------------------
    def encode_image(self, image: jax.Array) -> jax.Array:
        return self.image_encoder(image, train=False)

    def encode_text(self, batch: Dict[str, jax.Array]) -> jax.Array:
        return self.text_encoder(batch, train=False)

    def project_image(self, features: jax.Array) -> jax.Array:
        return self.loss.project_image(features)

    def project_text(self, features: jax.Array) -> jax.Array:
        return self.loss.project_text(features)
