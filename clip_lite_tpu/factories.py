"""Factories: name -> constructor registries for every component.

Same registry pattern and from_config contract as the reference
(``factories.py:36-73``), rebuilt for the JAX component set.  Heavy
factories (datasets, models, optimizers) import lazily so that e.g. the
optimizer factory is usable without the data stack.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict

from clip_lite_tpu.config import Config


class Factory:
    """Base class for all factories (reference: factories.py:36-73).

    * Factories cannot be instantiated.
    * ``PRODUCTS`` maps a string name to a constructor.
    * ``from_config`` builds a product straight from a :class:`Config`.
    """

    PRODUCTS: Dict[str, Callable] = {}

    def __init__(self):
        raise ValueError(
            f"Cannot instantiate {self.__class__.__name__}; use the "
            f"`create` classmethod."
        )

    @classmethod
    def create(cls, name: str, *args, **kwargs) -> Any:
        if name not in cls.PRODUCTS:
            raise KeyError(f"{cls.__name__} cannot create {name!r}. "
                           f"Choices: {sorted(cls.PRODUCTS)}")
        return cls.PRODUCTS[name](*args, **kwargs)

    @classmethod
    def from_config(cls, config: Config) -> Any:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Visual backbone
# ---------------------------------------------------------------------------

def _visual_products() -> Dict[str, Callable]:
    from clip_lite_tpu.models import image_encoder

    return image_encoder.BACKBONES


class VisualBackboneFactory(Factory):
    """Creates the Flax image tower (reference: factories.py:303-327)."""

    @classmethod
    def create(cls, name: str, *args, **kwargs) -> Any:
        products = _visual_products()
        if name not in products:
            raise KeyError(
                f"VisualBackboneFactory cannot create {name!r}. "
                f"Choices: {sorted(products)}"
            )
        return products[name](*args, **kwargs)

    @classmethod
    def from_config(cls, config: Config) -> Any:
        from clip_lite_tpu.models.image_encoder import ImageEncoder

        _C = config
        return ImageEncoder(
            img_enc_net=_C.MODEL.VISUAL.NETWORK_NAME,
            frozen=_C.MODEL.VISUAL.FROZEN,
            dtype_name=_C.DTYPE if _C.AMP else "float32",
            bn_mode=_C.MODEL.VISUAL.BN_MODE,
            data_axis=_C.PARALLEL.DATA_AXIS,
            remat=_C.MODEL.VISUAL.REMAT,
            width=_C.MODEL.VISUAL.WIDTH,
        )


class TextualHeadFactory(Factory):
    """Creates the Flax text tower (reference: factories.py:330-366)."""

    @classmethod
    def from_config(cls, config: Config) -> Any:
        from clip_lite_tpu.models.text_encoder import TextEncoder

        _C = config
        return TextEncoder(
            mode=_C.MODEL.TEXTUAL.NAME,
            transform_embedding=_C.MODEL.TEXTUAL.TRANSFORM,
            txt_enc_dim=_C.MODEL.TEXTUAL.FEATURE_SIZE,
            model_name=_C.MODEL.TEXTUAL.NETWORK_NAME,
            pretrained=_C.MODEL.TEXTUAL.PRETRAINED,
            num_hidden_layers=_C.MODEL.TEXTUAL.NUM_HIDDEN_LAYERS,
            vocab_size=_C.MODEL.TEXTUAL.VOCAB_SIZE,
            word_dict_path=_C.MODEL.TEXTUAL.WORD_DICT_PATH,
            glove_path=_C.MODEL.TEXTUAL.GLOVE_PATH,
            load_glove=_C.MODEL.TEXTUAL.LOAD_GLOVE,
            train_embeddings=_C.MODEL.TEXTUAL.TRAIN_EMBEDDINGS,
            dtype_name=_C.DTYPE if _C.AMP else "float32",
            fused_attention=_C.MODEL.TEXTUAL.FUSED_ATTENTION,
            transformer_dropout=_C.MODEL.TEXTUAL.DROPOUT,
            hidden_size=_C.MODEL.TEXTUAL.HIDDEN_SIZE,
        )


class LossFactory(Factory):
    """Creates the JSD InfoMax loss module (reference: factories.py:369-400)."""

    @classmethod
    def from_config(cls, config: Config) -> Any:
        from clip_lite_tpu.ops.loss import JSDInfoMaxLoss

        _C = config
        if _C.MODEL.LOSS.NAME != "jsd":
            raise KeyError(f"Unknown loss {_C.MODEL.LOSS.NAME!r}")
        return JSDInfoMaxLoss(
            image_dim=_C.MODEL.VISUAL.FEATURE_SIZE,
            text_dim=_C.MODEL.TEXTUAL.FEATURE_SIZE,
            critic_type=_C.MODEL.LOSS.TYPE,
            prior_weight=_C.MODEL.LOSS.PRIOR_WEIGHT,
            image_prior=_C.MODEL.LOSS.IMAGE_PRIOR,
            text_prior=_C.MODEL.LOSS.TEXT_PRIOR,
            visual_self_supervised=_C.MODEL.VISUAL.SELF_SUPERVISED,
            textual_self_supervised=_C.MODEL.TEXTUAL.SELF_SUPERVISED,
            negatives=_C.MODEL.LOSS.NEGATIVES,
            data_axis=_C.PARALLEL.DATA_AXIS,
            dtype_name=_C.DTYPE if _C.AMP else "float32",
        )


class PretrainingModelFactory(Factory):
    """Composes towers + loss into the pretraining model
    (reference: factories.py:403-434)."""

    @classmethod
    def from_config(cls, config: Config) -> Any:
        from clip_lite_tpu.models.model import VLInfoModel

        _C = config
        return VLInfoModel(
            image_encoder=VisualBackboneFactory.from_config(_C),
            text_encoder=TextualHeadFactory.from_config(_C),
            loss=LossFactory.from_config(_C),
            mode=_C.MODEL.TEXTUAL.NAME,
        )


class OptimizerFactory(Factory):
    """Builds the optax gradient-transformation chain
    (reference: factories.py:437-487).

    Param-group mapping mirrors the reference: params under the image
    tower get ``CNN_LR``, params under the text tower get ``TRANS_LR``,
    everything else ``LR``; weight decay is zeroed for paths matching
    ``NO_DECAY``.
    """

    @classmethod
    def from_config(cls, config: Config, schedule_fn=None,
                    hoist_lookahead: bool = False) -> Any:
        if config.OPTIM.FUSED:
            # Single-pass fused update (optim/fused.py): same math, one
            # kernel per leaf instead of one per chain stage — the optax
            # chain measured 20.8 ms/step standalone on the flagship tree.
            from clip_lite_tpu.optim.fused import build_fused_optimizer

            return build_fused_optimizer(config, schedule_fn=schedule_fn,
                                         hoist_lookahead=hoist_lookahead)
        if hoist_lookahead:
            raise ValueError("hoist_lookahead requires OPTIM.FUSED")
        from clip_lite_tpu.optim import build_optimizer

        return build_optimizer(config, schedule_fn=schedule_fn)


class LRSchedulerFactory(Factory):
    """Builds a warmup+decay multiplier schedule
    (reference: factories.py:490-531)."""

    @classmethod
    def from_config(cls, config: Config) -> Callable[[int], float]:
        from clip_lite_tpu.optim import schedules

        _C = config
        kwargs: Dict[str, Any] = dict(
            total_steps=_C.OPTIM.NUM_ITERATIONS,
            warmup_steps=_C.OPTIM.WARMUP_STEPS,
        )
        name = _C.OPTIM.LR_DECAY_NAME
        if name == "multistep":
            kwargs.update(gamma=_C.OPTIM.LR_GAMMA, milestones=list(_C.OPTIM.LR_STEPS))
        if name == "cosine":
            kwargs.update(min_mult=_C.OPTIM.MIN_LR_MULT)
        products = {
            "none": schedules.linear_warmup_no_decay,
            "multistep": schedules.linear_warmup_multistep,
            "linear": schedules.linear_warmup_linear_decay,
            "cosine": schedules.linear_warmup_cosine,
        }
        if name not in products:
            raise KeyError(f"Unknown LR schedule {name!r}")
        return products[name](**kwargs)


class TokenizerFactory(Factory):
    """Creates text tokenizers (reference: factories.py:76-100)."""

    @classmethod
    def from_config(cls, config: Config) -> Any:
        from clip_lite_tpu.data import tokenizers

        _C = config
        if _C.MODEL.TEXTUAL.NAME == "glove":
            return tokenizers.GloveTokenizer(_C.MODEL.TEXTUAL.WORD_DICT_PATH)
        return tokenizers.get_hf_tokenizer(
            _C.MODEL.TEXTUAL.NETWORK_NAME,
            max_length=_C.DATA.MAX_CAPTION_LENGTH,
        )


class ImageTransformsFactory(Factory):
    """Image/caption transforms with the reference's ``name::{'kw': v}``
    inline-kwargs syntax (reference: factories.py:103-166)."""

    @classmethod
    def _products(cls) -> Dict[str, Callable]:
        from clip_lite_tpu.data import transforms as T

        return T.TRANSFORM_PRODUCTS

    @classmethod
    def create(cls, name: str, *args, **kwargs) -> Any:
        if "::" in name:
            name, raw = name.split("::")
            _kwargs = eval(raw)  # same inline syntax as reference factories.py:155
        else:
            _kwargs = {}
        _kwargs.update(kwargs)
        products = cls._products()
        if name not in products:
            raise KeyError(
                f"ImageTransformsFactory cannot create {name!r}. "
                f"Choices: {sorted(products)}"
            )
        return products[name](*args, **_kwargs)

    @classmethod
    def from_config(cls, config: Config):
        raise NotImplementedError("Use create(); see PretrainingDatasetFactory.")


def _build_transform_pipeline(config: Config, split: str):
    from clip_lite_tpu.data import transforms as T

    _C = config
    names = list(
        _C.DATA.IMAGE_TRANSFORM_TRAIN if split == "train"
        else _C.DATA.IMAGE_TRANSFORM_VAL
    )
    tlist = []
    for name in names:
        base = name.split("::")[0]
        if "resize" in base or "crop" in base:
            tlist.append(ImageTransformsFactory.create(name, _C.DATA.IMAGE_CROP_SIZE))
        else:
            tlist.append(ImageTransformsFactory.create(name))
    return T.Compose(tlist)


class PretrainingDatasetFactory(Factory):
    """Creates pretraining datasets (reference: factories.py:169-238)."""

    @classmethod
    def _products(cls) -> Dict[str, Callable]:
        from clip_lite_tpu.data import datasets

        return {
            "captions": datasets.CocoCaptionsDataset,
            "random": datasets.RandomDataset,
            "json": datasets.JsonDataset,
        }

    @classmethod
    def from_config(cls, config: Config, split: str = "train") -> Any:
        _C = config
        products = cls._products()
        name = _C.MODEL.NAME
        if name not in products:
            raise KeyError(f"Unknown pretraining dataset {name!r}")

        kwargs = dict(
            data_root=_C.DATA.ROOT,
            split=split,
            mode=_C.DATA.NAME,
            tokenizer_name=_C.MODEL.TEXTUAL.NETWORK_NAME,
            vocab_size=_C.MODEL.TEXTUAL.VOCAB_SIZE,
            seq_buckets=list(_C.DATA.SEQ_BUCKETS),
            use_single_caption=_C.DATA.USE_SINGLE_CAPTION,
            visual_self_supervised=_C.MODEL.VISUAL.SELF_SUPERVISED,
            textual_self_supervised=_C.MODEL.TEXTUAL.SELF_SUPERVISED,
            percentage=_C.DATA.USE_PERCENTAGE,
            max_caption_length=_C.DATA.MAX_CAPTION_LENGTH,
            image_transform=_build_transform_pipeline(_C, split),
        )
        if name == "captions":
            kwargs["native_pipeline"] = _C.DATA.NATIVE_PIPELINE
            kwargs["crop_size"] = _C.DATA.IMAGE_CROP_SIZE
        if name == "json":
            json_files = (
                list(_C.DATA.JSON_FILES_TRAIN) if split == "train"
                else list(_C.DATA.JSON_FILES_VAL)
            )
            if split == "val":
                kwargs["percentage"] = 50.0
            return products[name](json_files, **kwargs)
        return products[name](**kwargs)


class NegativeSamplingDatasetFactory(Factory):
    """Creates cluster-based hard-negative datasets
    (reference: factories.py:241-300)."""

    @classmethod
    def from_config(cls, config: Config, split: str = "train") -> Any:
        from clip_lite_tpu.data import datasets

        _C = config
        if _C.DATA.NEGATIVE_SAMPLING != "clusters":
            raise KeyError(
                f"Unknown negative sampling {_C.DATA.NEGATIVE_SAMPLING!r}"
            )
        return datasets.CocoCaptionsClusteredDataset(
            data_root=_C.DATA.ROOT,
            split=split,
            mode=_C.DATA.NAME,
            tokenizer_name=_C.MODEL.TEXTUAL.NETWORK_NAME,
            vocab_size=_C.MODEL.TEXTUAL.VOCAB_SIZE,
            negative_sampling=_C.DATA.NEGATIVE_SAMPLING,
            total_iters=_C.OPTIM.NUM_ITERATIONS,
            negative_sampling_start_iter=_C.DATA.NEGATIVE_SAMPLING_START_ITERATION,
            cluster_path=_C.DATA.CLUSTER_PATH,
            use_single_caption=_C.DATA.USE_SINGLE_CAPTION,
            coco_root=_C.DATA.COCO_ROOT,
            max_caption_length=_C.DATA.MAX_CAPTION_LENGTH,
            image_transform=_build_transform_pipeline(_C, split),
        )


class DownstreamDatasetFactory(Factory):
    """Creates downstream eval datasets, keyed by dataset path suffix
    (reference: factories.py:534-616 keys on full paths; we key on the
    trailing directory name so it is machine-independent)."""

    @classmethod
    def _products(cls) -> Dict[str, Callable]:
        from clip_lite_tpu.data import datasets

        return {
            "VOC2007": datasets.VOC07ClassificationDataset,
            "imagenet": datasets.ImageNetDataset,
            "imagenet2012": datasets.ImageNetDataset,
            "inaturalist": datasets.INaturalist2018Dataset,
            "coco": datasets.ReEvalDataset,
            "flickr30k": datasets.FlickrReEvalDataset,
            "coco_gender": datasets.CocoObjectGender,
        }

    @classmethod
    def from_config(cls, config: Config, split: str = "train") -> Any:
        import os

        _C = config
        key = os.path.basename(os.path.normpath(_C.DATA.ROOT))
        products = cls._products()
        if key not in products:
            raise KeyError(
                f"DownstreamDatasetFactory: no dataset registered for path "
                f"{_C.DATA.ROOT!r} (key {key!r}). Choices: {sorted(products)}"
            )
        tsplit = "train" if "train" in split else "val"
        kwargs = dict(
            data_root=_C.DATA.ROOT,
            split=split,
            image_transform=_build_transform_pipeline(_C, tsplit),
        )
        if key == "flickr30k":
            kwargs["ann_file"] = os.path.join(_C.DATA.ROOT, "data/flickr30k_test.json")
        return products[key](**kwargs)
