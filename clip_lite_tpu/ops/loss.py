"""JSD InfoMax contrastive loss and its critics.

The scientific core of CLIP-Lite: a Jensen-Shannon-divergence mutual
information lower bound that needs only ONE negative per positive
(reference: loss.py:110-314).  The projection heads ("MILinearBlock")
live *inside* the loss module because every downstream eval reaches into
``loss.global_d.{img_block,text_block}`` to project embeddings
(reference: retrieval.py:71-74, zero_shot.py:98-101) — that coupling is
API surface, preserved here.

TPU-native departures from the reference:
  * the roll-by-one negative pairing can span the *global* batch across
    the device mesh via a one-row ppermute (``negatives="global"``), or
    stay shard-local for exact reference parity (``negatives="local"``);
  * all critic math (softplus/log/normalize) runs in float32 regardless
    of the bfloat16 compute dtype of the projection matmuls;
  * the prior terms' uniform noise comes from an explicit 'prior' RNG
    stream instead of torch.rand_like (reference: loss.py:189).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from clip_lite_tpu.ops.layers import (
    BatchNorm,
    LayerNorm,
    Linear,
    l2_normalize,
    torch_linear_kernel_init,
)
from clip_lite_tpu.parallel.collectives import roll_shifted_left

DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def _shortcut_kernel_init(key, shape, dtype=jnp.float32):
    """Noisy-identity init for the MILinearBlock shortcut
    (reference: loss.py:26-32): U(-0.01, 0.01) with the leading diagonal
    set to exactly 1.0.  ``shape`` is (feature_sz, units), units >= feature_sz.
    """
    feature_sz, units = shape
    w = jax.random.uniform(key, shape, dtype, -0.01, 0.01)
    idx = jnp.arange(min(feature_sz, units))
    return w.at[idx, idx].set(1.0)


class MILinearBlock(nn.Module):
    """Projection head: Linear-BN-ReLU-Linear + noisy-identity shortcut,
    LayerNorm on the sum (reference: loss.py:12-40)."""

    units: int = 2048
    bln: bool = True
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feat: jax.Array, train: bool = True) -> jax.Array:
        h = Linear(self.units, use_bias=False, dtype=self.dtype,
                   name="nonlinear_fc1")(feat)
        h = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      axis_name=self.bn_axis_name, name="nonlinear_bn")(h)
        h = nn.relu(h)
        h = Linear(self.units, dtype=self.dtype, name="nonlinear_fc2")(h)

        s = Linear(self.units, dtype=self.dtype,
                   kernel_init=_shortcut_kernel_init, name="shortcut")(feat)
        f = h + s
        if self.bln:
            f = LayerNorm(dtype=self.dtype, name="block_ln")(f)
        return f


class PriorDiscriminator(nn.Module):
    """3-layer MLP -> sigmoid matching prior on embeddings
    (reference: loss.py:43-53)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(Linear(1000, dtype=self.dtype, name="l0")(x))
        h = nn.relu(Linear(200, dtype=self.dtype, name="l1")(h))
        logit = Linear(1, dtype=self.dtype, name="l2")(h)
        return jax.nn.sigmoid(logit.astype(jnp.float32))


class GlobalDiscriminator(nn.Module):
    """Concat-MLP critic: T(x, y) = MLP([x; y]) (reference: loss.py:56-68)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features1: jax.Array, features2: jax.Array,
                 train: bool = True) -> jax.Array:
        x = jnp.concatenate([features1, features2], axis=1)
        h = nn.relu(Linear(512, dtype=self.dtype, name="l0")(x))
        h = nn.relu(Linear(512, dtype=self.dtype, name="l1")(h))
        out = Linear(1, dtype=self.dtype, name="l2")(h)
        return out.astype(jnp.float32)[:, 0]


class GlobalDiscriminatorDot(nn.Module):
    """Encode-and-dot critic: project both modalities to ``units`` dims,
    L2-normalize, paired dot, scale by learnable temperature exp(log(1/0.07))
    (reference: loss.py:76-107)."""

    units: int = 2048
    bln: bool = True
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    def setup(self):
        self.img_block = MILinearBlock(
            units=self.units, bln=self.bln, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name)
        self.text_block = MILinearBlock(
            units=self.units, bln=self.bln, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name)
        self.temperature = self.param(
            "temperature",
            lambda key: jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
        )

    def __call__(self, features1: jax.Array, features2: jax.Array,
                 train: bool = True) -> jax.Array:
        f1 = self.img_block(features1, train=train)
        f2 = self.text_block(features2, train=train)
        f1 = l2_normalize(f1)
        f2 = l2_normalize(f2)
        # Paired dot (einsum "n d, n d -> n"), fp32, scaled by exp(T).
        o = jnp.sum(f1 * f2, axis=-1) * jnp.exp(self.temperature)
        return o

    # -- downstream-eval projection API (reference reaches into
    #    loss.global_d.{img,text}_block, e.g. retrieval.py:71-74) ---------
    def project_image(self, features: jax.Array) -> jax.Array:
        return self.img_block(features, train=False)

    def project_text(self, features: jax.Array) -> jax.Array:
        return self.text_block(features, train=False)


def _jsd_pair_terms(critic, pos1, pos2, neg2, train):
    """Ej = -softplus(-T(x, y)).mean();  Em = softplus(T(x, y')).mean()
    (reference: loss.py:206-222).  Returns Em - Ej."""
    ej = -jax.nn.softplus(-critic(pos1, pos2, train=train)).mean()
    em = jax.nn.softplus(critic(pos1, neg2, train=train)).mean()
    return em - ej


class JSDInfoMaxLoss(nn.Module):
    """JSD InfoMax objective with optional priors and SSL terms
    (reference: loss.py:110-314).

    total = (1 - prior_weight) * (cross_modal + visual + textual)
          + prior_weight * (image_prior + text_prior)
    """

    image_dim: int = 2048
    text_dim: int = 768
    critic_type: str = "dot"
    prior_weight: float = 0.1
    image_prior: bool = True
    text_prior: bool = False
    visual_self_supervised: bool = False
    textual_self_supervised: bool = False
    negatives: str = "local"  # {"local", "global"}
    data_axis: str = "data"
    dtype_name: str = "float32"

    def setup(self):
        dtype = DTYPES[self.dtype_name]
        dot = lambda name: GlobalDiscriminatorDot(dtype=dtype, name=name)
        cat = lambda name: GlobalDiscriminator(dtype=dtype, name=name)

        # Critic-type dispatch (reference: loss.py:129-169).
        if self.critic_type == "concat":
            self.global_d = cat("global_d")
            if self.visual_self_supervised:
                self.visual_d = cat("visual_d")
            if self.textual_self_supervised:
                self.textual_d = cat("textual_d")
        elif self.critic_type == "dot":
            self.global_d = dot("global_d")
            if self.visual_self_supervised:
                self.visual_d = dot("visual_d")
            if self.textual_self_supervised:
                self.textual_d = dot("textual_d")
        elif self.critic_type == "condot":
            self.global_d = cat("global_d")
            if self.visual_self_supervised:
                self.visual_d = dot("visual_d")
            if self.textual_self_supervised:
                self.textual_d = dot("textual_d")
        elif self.critic_type == "dotcon":
            self.global_d = dot("global_d")
            if self.visual_self_supervised:
                self.visual_d = cat("visual_d")
            if self.textual_self_supervised:
                self.textual_d = cat("textual_d")
        else:
            raise ValueError(f"Unknown critic type {self.critic_type!r}")

        if self.image_prior:
            self.prior_d = PriorDiscriminator(dtype=dtype, name="prior_d")
        if self.text_prior:
            self.text_prior_d = PriorDiscriminator(dtype=dtype, name="text_prior_d")

    def __call__(
        self,
        image_features: jax.Array,
        text_features: jax.Array,
        neg_image_features: Optional[jax.Array] = None,
        neg_text_features: Optional[jax.Array] = None,
        aug_image_features: Optional[jax.Array] = None,
        aug_text_features: Optional[jax.Array] = None,
        train: bool = True,
    ) -> dict:
        # ---- prior terms (reference: loss.py:185-200) --------------------
        prior_total = jnp.float32(0.0)
        if self.image_prior:
            noise = jax.random.uniform(
                self.make_rng("prior"), image_features.shape, jnp.float32)
            term_a = jnp.log(self.prior_d(noise)).mean()
            term_b = jnp.log(1.0 - self.prior_d(image_features)).mean()
            prior_total = prior_total + -(term_a + term_b)
        if self.text_prior:
            noise = jax.random.uniform(
                self.make_rng("prior"), text_features.shape, jnp.float32)
            term_a = jnp.log(self.text_prior_d(noise)).mean()
            term_b = jnp.log(1.0 - self.text_prior_d(text_features)).mean()
            prior_total = prior_total + -(term_a + term_b)

        # ---- cross-modal JSD term ----------------------------------------
        if neg_text_features is None:
            # Normal mode: negatives by roll-by-one (loss.py:204-222).
            text_prime = roll_shifted_left(
                text_features, self.data_axis, self.negatives)
            cross_modal = _jsd_pair_terms(
                self.global_d, image_features, text_features, text_prime, train)
        else:
            # Cluster mode: half the batch carries mined hard negatives
            # (loss.py:225-252).
            image_all = jnp.concatenate(
                [image_features, neg_image_features], axis=0)
            text_all = jnp.concatenate(
                [text_features, neg_text_features], axis=0)
            ej = -jax.nn.softplus(
                -self.global_d(image_all, text_all, train=train)).mean()
            # Shuffle the easy half so it does not pair with itself.
            text_shifted = roll_shifted_left(
                text_features, self.data_axis, self.negatives)
            text_prime_all = jnp.concatenate(
                [neg_text_features, text_shifted], axis=0)
            em = jax.nn.softplus(
                self.global_d(image_all, text_prime_all, train=train)).mean()
            cross_modal = em - ej

        # ---- SSL terms (reference: loss.py:256-300) -----------------------
        visual = jnp.float32(0.0)
        if aug_image_features is not None:
            aug_prime = roll_shifted_left(
                aug_image_features, self.data_axis, self.negatives)
            visual = _jsd_pair_terms(
                self.visual_d, image_features, aug_image_features, aug_prime,
                train)
        textual = jnp.float32(0.0)
        if aug_text_features is not None:
            aug_prime = roll_shifted_left(
                aug_text_features, self.data_axis, self.negatives)
            textual = _jsd_pair_terms(
                self.textual_d, text_features, aug_text_features, aug_prime,
                train)

        jsd = cross_modal + visual + textual
        total = (1.0 - self.prior_weight) * jsd + self.prior_weight * prior_total

        return {
            "total_loss": total,
            "cross_modal_loss": cross_modal,
            "visual_loss": visual,
            "textual_loss": textual,
        }

    # -- projection API for downstream evals ------------------------------
    def project_image(self, features: jax.Array) -> jax.Array:
        """Project image embeddings through the critic's image block
        (used by retrieval/zero-shot/VOC evals)."""
        return self.global_d.project_image(features)

    def project_text(self, features: jax.Array) -> jax.Array:
        return self.global_d.project_text(features)
