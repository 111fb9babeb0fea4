"""VOC object-detection fine-tune via Detectron2 (GPU-host interop).

TPU has no Detectron2 stack; the TPU side of this workflow is the
backbone export (``python -m clip_lite_tpu.voc_det`` -> D2-named
``.pkl``).  This driver is the OTHER half of the reference's detection
eval (reference: voc_det.py:81-175), to be run on a GPU machine with
detectron2 installed: it registers the res5-plus-norm ROI head, builds
the D2 config from a base YAML + overrides, injects the exported
backbone weights, trains with periodic checkpoints, and evaluates with
the Pascal-VOC evaluator.

Package-gated: importing detectron2 happens inside main(); everything
else (argument surface, config assembly) is importable and tested
without it.

Usage (on the D2 host):
    python -m clip_lite_tpu.scripts.d2_finetune \
        --d2-config configs/d2/pascal_voc_R_50_C4_24k.yaml \
        --weights backbone_d2.pkl --output-dir /tmp/voc_det \
        [--eval-only] [--resume] [--d2-config-override K V ...]
"""

from __future__ import annotations

import argparse
import pickle
import re

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--d2-config", required=True,
                    help="Base Detectron2 YAML (e.g. the VOC Faster R-CNN "
                         "C4 recipe; see docs/DETECTRON2.md).")
parser.add_argument("--d2-config-override", nargs="*", default=[],
                    help="Detectron2 dotted-key overrides.")
parser.add_argument("--weights", required=True,
                    help=".pkl from `python -m clip_lite_tpu.voc_det`, or a "
                         "D2 checkpoint when --resume/--eval-only.")
parser.add_argument("--output-dir", required=True)
parser.add_argument("--resume", action="store_true",
                    help="Resume from a Detectron2 checkpoint in "
                         "--output-dir.")
parser.add_argument("--eval-only", action="store_true")
parser.add_argument("--checkpoint-every", type=int, default=5000)
parser.add_argument("--cpu-workers", type=int, default=4)
parser.add_argument("--network-name", default="resnet50",
                    help="Backbone name the weights came from (sets "
                         "MODEL.RESNETS.DEPTH).")


def resnet_depth(network_name: str) -> int:
    m = re.search(r"resnet(\d+)", network_name)
    if not m:
        raise ValueError(f"Cannot infer ResNet depth from {network_name!r}")
    return int(m.group(1))


def assemble_d2_config(d2, _A):
    """Base YAML -> CLI overrides -> worker/checkpoint/output knobs ->
    backbone depth (the reference's config assembly, voc_det.py:95-116)."""
    cfg = d2.config.get_cfg()
    cfg.merge_from_file(_A.d2_config)
    cfg.merge_from_list(list(_A.d2_config_override))
    cfg.DATALOADER.NUM_WORKERS = _A.cpu_workers
    cfg.SOLVER.CHECKPOINT_PERIOD = _A.checkpoint_every
    cfg.OUTPUT_DIR = _A.output_dir
    cfg.MODEL.RESNETS.DEPTH = resnet_depth(_A.network_name)
    return cfg


def main(_A) -> None:
    try:
        import detectron2 as d2
        from detectron2.checkpoint import DetectionCheckpointer
        from detectron2.engine import DefaultTrainer
        from detectron2.evaluation import PascalVOCDetectionEvaluator
        from detectron2.modeling.roi_heads import (
            ROI_HEADS_REGISTRY,
            Res5ROIHeads,
        )
    except ImportError as e:
        raise RuntimeError(
            "Detectron2 fine-tune runs on a GPU host with detectron2 "
            "installed; on the TPU side use `python -m clip_lite_tpu."
            "voc_det` to export the backbone.") from e

    if "Res5ROIHeadsExtraNorm" not in ROI_HEADS_REGISTRY:
        @ROI_HEADS_REGISTRY.register()
        class Res5ROIHeadsExtraNorm(Res5ROIHeads):
            """res5 stage followed by an extra norm layer — the VOC C4
            head the reference uses (voc_det.py:81-92)."""

            def _build_res5_block(self, cfg):
                seq, out_channels = super()._build_res5_block(cfg)
                seq.add_module(
                    "norm",
                    d2.layers.get_norm(cfg.MODEL.RESNETS.NORM, out_channels))
                return seq, out_channels

    cfg = assemble_d2_config(d2, _A)

    class VOCTrainer(DefaultTrainer):
        @classmethod
        def build_evaluator(cls, cfg, dataset_name, output_folder=None):
            return PascalVOCDetectionEvaluator(dataset_name)

    if _A.eval_only:
        model = VOCTrainer.build_model(cfg)
        DetectionCheckpointer(model).load(_A.weights)
        results = VOCTrainer.test(cfg, model)
        print(results)
        return

    trainer = VOCTrainer(cfg)
    if _A.resume:
        DetectionCheckpointer(
            trainer.model, optimizer=trainer.optimizer,
            scheduler=trainer.scheduler,
        ).resume_or_load(_A.weights, resume=True)
    else:
        with open(_A.weights, "rb") as f:
            state = pickle.load(f)
        DetectionCheckpointer(trainer.model)._load_model(state)
    trainer.train()


if __name__ == "__main__":
    main(parser.parse_args())
