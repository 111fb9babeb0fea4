"""Shared downstream-eval plumbing: load a pretrained checkpoint and expose
jit-compiled, fixed-shape encode/project functions.

Every reference eval reaches into the loss module's projection blocks
(reference: retrieval.py:70-74, zero_shot.py:96-101, voc_clf.py:178);
here that is the model's ``project_image``/``project_text`` API.  All
encode functions are compiled once for a fixed batch size; the last chunk
is padded and sliced (static shapes — no per-tail recompiles).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from clip_lite_tpu.config import Config
from clip_lite_tpu.factories import PretrainingModelFactory
from clip_lite_tpu.ops.layers import l2_normalize
from clip_lite_tpu.utils.checkpointing import load_model_variables


class EncoderBundle:
    """Pretrained two-tower encoders + projectors, ready for eval."""

    def __init__(self, config: Config, checkpoint_path: Optional[str] = None,
                 batch_size: int = 128, project: bool = True,
                 normalize: bool = True):
        self.config = config
        self.model = PretrainingModelFactory.from_config(config)
        self.batch_size = batch_size
        self.project = project
        self.normalize = normalize

        crop = config.DATA.IMAGE_CROP_SIZE
        seq = config.DATA.MAX_CAPTION_LENGTH
        sample = {"image": jnp.zeros((1, crop, crop, 3), jnp.float32)}
        if config.MODEL.TEXTUAL.NAME == "glove":
            sample["caption_tokens"] = jnp.zeros((1, seq), jnp.int32)
        elif config.MODEL.TEXTUAL.NAME == "sbert":
            sample["caption_encodings"] = jnp.zeros((1, 768), jnp.float32)
        else:
            sample["input_ids"] = jnp.zeros((1, seq), jnp.int32)
            sample["attention_mask"] = jnp.ones((1, seq), jnp.int32)
        if checkpoint_path:
            self.variables = load_model_variables(checkpoint_path)
        else:
            self.variables = self.model.init(
                {"params": jax.random.PRNGKey(0),
                 "prior": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2)}, sample, train=False)
            self.variables = {"params": self.variables["params"],
                              "batch_stats": self.variables.get(
                                  "batch_stats", {})}

        model = self.model
        # Variables must be jit ARGUMENTS, not closure constants: a
        # closed-over checkpoint tree (hundreds of MB of numpy) is baked
        # into the lowered HLO as literals, which the axon remote-compile
        # tunnel rejects with HTTP 413 (docs/PERF_NOTES.md "Backend
        # landmines").  One device_put here, then every chunk reuses the
        # device-resident tree.
        variables_dev = jax.device_put(self.variables)

        def _img(variables, images):
            feats = model.apply(variables, images,
                                method=model.encode_image)
            if project:
                feats = model.apply(variables, feats,
                                    method=model.project_image)
            return l2_normalize(feats) if normalize else feats

        text_mode = config.MODEL.TEXTUAL.NAME

        def _txt(variables, input_ids, attention_mask):
            if text_mode == "glove":
                batch = {"caption_tokens": input_ids}
            else:
                batch = {"input_ids": input_ids,
                         "attention_mask": attention_mask}
            feats = model.apply(variables, batch, method=model.encode_text)
            if project:
                feats = model.apply(variables, feats,
                                    method=model.project_text)
            return l2_normalize(feats) if normalize else feats

        jit_img, jit_txt = jax.jit(_img), jax.jit(_txt)
        self._img_fn = lambda images: jit_img(variables_dev, images)
        self._txt_fn = lambda ids, mask: jit_txt(variables_dev, ids, mask)

    # -- batched host-side APIs -------------------------------------------
    def encode_images(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) fp32 -> (N, D) fp32."""
        return _chunked(self._img_fn, self.batch_size, images)

    def encode_image_batches(self, batch_iter) -> np.ndarray:
        outs = []
        for batch in batch_iter:
            img = batch["image"] if isinstance(batch, dict) else batch
            outs.append(_chunked(self._img_fn, self.batch_size,
                                 np.asarray(img)))
        return np.concatenate(outs, axis=0)

    def encode_texts(self, texts: List[str], tokenizer) -> np.ndarray:
        seq = self.config.DATA.MAX_CAPTION_LENGTH
        if self.config.MODEL.TEXTUAL.NAME == "glove":
            # GloveTokenizer: variable-length id lists, pad to seq.
            pad = tokenizer.pad_id
            ids = np.full((len(texts), seq), pad, np.int32)
            for i, t in enumerate(texts):
                enc = tokenizer.encode(t)[:seq]
                ids[i, : len(enc)] = enc
            mask = (ids != pad).astype(np.int32)
        else:
            enc = tokenizer(list(texts), padding="max_length",
                            truncation=True, max_length=seq)
            ids = np.asarray(enc["input_ids"], np.int32)
            mask = np.asarray(enc["attention_mask"], np.int32)
        return _chunked(self._txt_fn, self.batch_size, ids, mask)


def _chunked(fn: Callable, batch_size: int, *arrays) -> np.ndarray:
    """Apply a fixed-batch jitted fn over N rows with tail padding."""
    n = arrays[0].shape[0]
    outs = []
    for start in range(0, n, batch_size):
        chunk = [a[start: start + batch_size] for a in arrays]
        pad = batch_size - chunk[0].shape[0]
        if pad:
            chunk = [np.concatenate(
                [c, np.repeat(c[-1:], pad, axis=0)], axis=0) for c in chunk]
        out = np.asarray(fn(*[jnp.asarray(c) for c in chunk]))
        outs.append(out[: batch_size - pad] if pad else out)
    return np.concatenate(outs, axis=0)


def itm_eval(scores_i2t: np.ndarray, scores_t2i: np.ndarray,
             txt2img: dict, img2txt: dict) -> dict:
    """Image-text retrieval recalls (reference: retrieval.py:152-209).

    scores_i2t: (num_images, num_texts); img2txt maps image INDEX to the
    list of its ground-truth text indices; txt2img the reverse.
    """
    # Image -> Text: rank of the best-ranked ground-truth caption.
    ranks = np.zeros(scores_i2t.shape[0])
    for index, score in enumerate(scores_i2t):
        order = np.argsort(score)[::-1]
        pos = np.isin(order, img2txt[index]).nonzero()[0]
        ranks[index] = pos.min() if pos.size else 1e20
    tr1, tr5, tr10 = [100.0 * (ranks < k).mean() for k in (1, 5, 10)]

    # Text -> Image.
    ranks = np.zeros(scores_t2i.shape[0])
    for index, score in enumerate(scores_t2i):
        order = np.argsort(score)[::-1]
        ranks[index] = np.where(order == txt2img[index])[0][0]
    ir1, ir5, ir10 = [100.0 * (ranks < k).mean() for k in (1, 5, 10)]

    tr_mean = (tr1 + tr5 + tr10) / 3
    ir_mean = (ir1 + ir5 + ir10) / 3
    return {
        "txt_r1": tr1, "txt_r5": tr5, "txt_r10": tr10, "txt_r_mean": tr_mean,
        "img_r1": ir1, "img_r5": ir5, "img_r10": ir10, "img_r_mean": ir_mean,
        "r_mean": (tr_mean + ir_mean) / 2,
    }
